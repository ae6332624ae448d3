"""Pandas-UDF surface corpus (SURVEY §2.B UDF row): grouped-map via
``applyInPandas`` and UDAF via ``pandas_udf`` GROUPED_AGG.

The arithmetic is chosen to stay hash-exact across engines: integer
sums (exact in int64 and in fp up to 2^53) and medians of integers
(exact fp values: an integer, or integer + 0.5) — so even these
Python-computed results value-match the DuckDB oracle, proving the
Arrow round-trip loses nothing.

Scale notes: applyInPandas shuffles the full group to one worker — fine
for bounded groups (here: per-source document slices), wrong for
power-law keys (use window functions or two-phase aggs instead, see
operators/skew.py). GROUPED_AGG pandas_udf does NOT do partial
aggregation map-side — every row crosses the shuffle, unlike built-in
aggregates; prefer built-ins unless the aggregate genuinely needs numpy.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import query, t

_GROUPED_SCHEMA = (
    "source string, n_docs long, min_chars long, max_chars long, median_chars double"
)


def _per_source_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    s = pdf["n_chars"]
    return pd.DataFrame(
        {
            "source": [pdf["source"].iloc[0]],
            "n_docs": [int(len(s))],
            "min_chars": [int(s.min())],
            "max_chars": [int(s.max())],
            "median_chars": [float(s.median())],
        }
    )


@query(
    "q65_grouped_map_pandas",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(quantile_cont(n_chars, 0.5) AS DOUBLE) AS median_chars
    FROM documents GROUP BY source ORDER BY source
    """,
    category="udf",
)
def q65(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents").select("source", "n_chars")
    return (
        docs.groupBy("source")
        .applyInPandas(_per_source_stats, schema=_GROUPED_SCHEMA)
        .orderBy("source")
    )


@query(
    "q66_grouped_agg_pandas",
    oracle="""
    SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
    category="udf",
)
def q66(spark: SparkSession, sf: str) -> DataFrame:
    @F.pandas_udf("long")
    def total_chars(v: pd.Series) -> int:  # GROUPED_AGG: Series -> scalar
        return int(v.sum())

    docs = t(spark, sf, "documents").select("lang", "n_chars")
    return (
        docs.groupBy("lang")
        .agg(total_chars("n_chars").alias("total_chars"))
        .orderBy("lang")
    )
