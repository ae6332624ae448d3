"""t2 correctness corpus: named queries with Spark implementations and
DuckDB oracle SQL."""

from .corpus import QUERIES, Query, get_queries, get_oracles  # noqa: F401
