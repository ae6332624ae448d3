"""Corpus infrastructure: query registry + determinism helpers.

Every query is registered with a Spark callable ``(spark, sf_dir) ->
DataFrame`` and (when SQL-expressible) a DuckDB oracle string. The
driver hash-compares both sides, so the corpus follows hard conventions:

- every aggregate/computed column is aliased identically on both sides;
- double aggregations go through exact DECIMAL sums and come back as
  DOUBLE (`dsum`) so results are bit-identical regardless of engine,
  partitioning, or reduction order — floating-point sums are NOT
  reduction-order-stable, decimal sums are;
- timestamps surface as DATE or ISO strings (UTC session TZ);
- LIMIT/top-k queries carry a total order with a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    category: str
    headline: bool = False
    doc: str = ""


QUERIES: dict[str, Query] = {}


def query(
    name: str,
    oracle: str | None,
    category: str,
    headline: bool = False,
    doc: str = "",
):
    """Register a corpus query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = Query(name, fn, oracle, category, headline, doc or (fn.__doc__ or ""))
        return fn

    return deco


def sql_query(
    name: str,
    sql: str,
    category: str,
    oracle: str | None = None,
    headline: bool = False,
    doc: str = "",
) -> None:
    """Register a query whose Spark side is ``spark.sql`` over the star
    views; by default the oracle is the *same* SQL text (the dialect
    subset shared by Spark SQL and DuckDB)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..sources.tables import register_star_schema

        register_star_schema(spark, sf_dir)
        return spark.sql(sql)

    QUERIES[name] = Query(name, run, oracle if oracle is not None else sql, category, headline, doc)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.tables import load_table

    return load_table(spark, sf_dir, name)


# ---- determinism helpers (Spark side) ----

def dsum(col: str | F.Column, alias: str, scale: int = 2) -> F.Column:
    """Exact decimal sum surfaced as double: deterministic under any
    partitioning/order, unlike a native double sum.

    Input casts to decimal(18,s) — the widest precision Spark still
    backs with an unscaled long; Sum's buffer promotes to decimal(28,s)
    (~1e22 headroom at scale 6), so per-row values stay on the fast
    path while the accumulator never overflows at 100 TB row counts.
    Any no-overflow precision gives identical (exact) results, so the
    oracle side may sum at decimal(28) and still hash-match."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(18,{scale})")).cast("double").alias(alias)
    )


def davg(col: str | F.Column, alias: str, scale: int = 2) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return (
        (F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c))
        .alias(alias)
    )


def sql_dsum(expr: str, alias: str, scale: int = 2) -> str:
    """Oracle-side twin of dsum."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,{scale}))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(28,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
