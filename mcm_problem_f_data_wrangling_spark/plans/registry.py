"""Query registry assembling the full driver-facing suite."""

from __future__ import annotations

from .base import Query
from .suite_core import QUERIES as CORE_QUERIES
from .suite_ext import QUERIES as EXT_QUERIES
from .suite_more import QUERIES as MORE_QUERIES
from .suite_nlp import QUERIES as NLP_QUERIES
from .suite_tpch import QUERIES as TPCH_QUERIES

REGISTRY: dict[str, Query] = {
    q.name: q
    for q in (*CORE_QUERIES, *EXT_QUERIES, *MORE_QUERIES, *TPCH_QUERIES, *NLP_QUERIES)
}

if len(REGISTRY) != len(CORE_QUERIES) + len(EXT_QUERIES) + len(MORE_QUERIES) + len(TPCH_QUERIES) + len(NLP_QUERIES):  # pragma: no cover
    raise RuntimeError("duplicate query names in suite")


def get_query(name: str) -> Query:
    return REGISTRY[name]


def headline_queries() -> list[Query]:
    """The bench.py subset — one per major operator family."""
    return [q for q in REGISTRY.values() if q.headline]
