from .registry import REGISTRY, Query, get_query, headline_queries  # noqa: F401
