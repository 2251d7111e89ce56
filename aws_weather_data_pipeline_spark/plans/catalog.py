"""Top-level query catalog: merges every operator module's registry.

``__spark_entry__`` consumes this; tests replay the same comparisons.
"""

from __future__ import annotations

from .registry import QueryCatalog


def build_catalog() -> QueryCatalog:
    from . import relational

    cat = QueryCatalog()
    cat.merge(relational.CATALOG)
    for modname in ("temporal", "text", "similarity", "weatherlike"):
        try:
            import importlib

            mod = importlib.import_module(f".{modname}", __package__)
            cat.merge(mod.CATALOG)
        except ImportError:
            pass
    return cat
