from . import slab  # noqa: F401

try:  # cylinder module lands after slab in the build order
    from . import cylinder  # noqa: F401
except ImportError:  # pragma: no cover
    pass
