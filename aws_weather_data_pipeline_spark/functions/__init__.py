from .exact import dec, dsum, davg

__all__ = ["dec", "dsum", "davg"]
