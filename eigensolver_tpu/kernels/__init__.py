from . import bessel  # noqa: F401
