from .registry import CatalogQuery, QueryCatalog

__all__ = ["CatalogQuery", "QueryCatalog"]
