from . import vtk_native  # noqa: F401
from . import store  # noqa: F401
