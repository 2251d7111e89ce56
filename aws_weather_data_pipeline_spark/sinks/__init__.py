from . import writers  # noqa: F401
