"""Top-level query catalog: merges every operator module's registry.

``__spark_entry__`` consumes this; tests replay the same comparisons.
"""

from __future__ import annotations

import importlib
import importlib.util

from .registry import QueryCatalog

# Every operator module that contributes catalog queries. A module listed
# here but absent on disk is skipped (feature not built yet); a module
# that EXISTS but fails to import raises — a typo inside an operator
# module must never silently shrink driver coverage.
OPERATOR_MODULES = (
    "weatherlike",
    "temporal",
    "text",
    "similarity",
    "multimodal",
    "sampling",
)


def build_catalog() -> QueryCatalog:
    from . import relational

    cat = QueryCatalog()
    cat.merge(relational.CATALOG)
    for modname in OPERATOR_MODULES:
        if importlib.util.find_spec(f".{modname}", __package__) is None:
            continue
        mod = importlib.import_module(f".{modname}", __package__)
        cat.merge(mod.CATALOG)
    return cat
