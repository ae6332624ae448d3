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


# --------------------------------------------------------------------------
# q113 — Python UDTF via LATERAL SQL: the registered chunk_text UDTF
# (functions/udtf.py) expands each document into fixed-width chunks
# inside a SQL query — the table-function surface (one row in, N rows
# out) the archive-explode ingest path uses, here driven from SQL. The
# oracle replays the same chunking with substr arithmetic, so a hash
# match proves the UDTF row-expansion path exact.
# --------------------------------------------------------------------------

_UDTF_WIDTH = 200
_UDTF_DOCS = 100


@query(
    "q113_udtf_lateral",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text,
             CAST(ceil(length(text) / {_UDTF_WIDTH}.0) AS INT) AS nc
      FROM documents WHERE doc_id < {_UDTF_DOCS}
    ),
    g AS (SELECT doc_id, text, unnest(generate_series(1, nc)) AS i FROM d)
    SELECT doc_id,
           CAST(i - 1 AS BIGINT) AS chunk_id,
           md5(substr(text, (i - 1) * {_UDTF_WIDTH} + 1, {_UDTF_WIDTH})) AS chunk_digest,
           CAST(length(substr(text, (i - 1) * {_UDTF_WIDTH} + 1, {_UDTF_WIDTH})) AS BIGINT)
             AS chunk_len
    FROM g ORDER BY doc_id, chunk_id
    """,
    category="udf",
)
def q113(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.udtf import register_udtfs
    from ..sources.tables import register_star_schema

    register_star_schema(spark, sf)
    register_udtfs(spark)
    return spark.sql(
        f"""
        SELECT doc_id, c.chunk_id, md5(c.chunk) AS chunk_digest, c.chunk_len
        FROM documents, LATERAL chunk_text(text, {_UDTF_WIDTH}) AS c
        WHERE doc_id < {_UDTF_DOCS}
        ORDER BY doc_id, chunk_id
        """
    )
