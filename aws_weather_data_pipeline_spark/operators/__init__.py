from . import skew  # noqa: F401
