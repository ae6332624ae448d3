"""Multimodal-column corpus: binary payload decode / feature extraction /
frame sampling via Arrow-batched mapInPandas (functions/multimodal.py).

The decoders are deterministic md5-derived stubs (real codecs aren't in
this container), which makes the *entire Python-worker path* — Arrow
batch transfer, schema projection, row expansion — value-checkable
against a DuckDB oracle replaying the same digest arithmetic in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.multimodal import frame_sample, image_features, with_payload
from .base import query, t

_N_DOCS = 100  # bounded slice: per-row feature outputs stay small


@query(
    "q61_image_features",
    oracle=f"""
    SELECT doc_id,
           CAST(CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 512 + 1 AS INTEGER) AS width,
           CAST(CAST('0x' || substr(md5(text), 5, 4) AS BIGINT) % 512 + 1 AS INTEGER) AS height,
           CAST(CAST('0x' || substr(md5(text), 9, 1) AS BIGINT) % 3 + 1 AS INTEGER) AS n_channels,
           CAST(CAST('0x' || substr(md5(text), 10, 4) AS BIGINT) % 256 AS DOUBLE) AS mean_intensity
    FROM documents WHERE doc_id < {_N_DOCS} ORDER BY doc_id
    """,
    category="multimodal",
)
def q61(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents").filter(F.col("doc_id") < _N_DOCS)
    feat = image_features(with_payload(docs.select("doc_id", "text")))
    return feat.select(
        "doc_id", "width", "height", "n_channels", "mean_intensity"
    ).orderBy("doc_id")


@query(
    "q62_frame_sample",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, md5(text) AS hx,
             CAST(CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 8 + 1 AS INTEGER) AS n_frames
      FROM documents WHERE doc_id < {_N_DOCS}
    )
    SELECT doc_id,
           CAST(f - 1 AS INTEGER) AS frame_idx,
           n_frames,
           md5(hx || '_' || CAST(f - 1 AS VARCHAR)) AS frame_digest
    FROM v CROSS JOIN generate_series(1, 8) AS gs(f)
    WHERE f <= n_frames
    ORDER BY doc_id, frame_idx
    """,
    category="multimodal",
)
def q62(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents").filter(F.col("doc_id") < _N_DOCS)
    frames = frame_sample(with_payload(docs.select("doc_id", "text")))
    return frames.select("doc_id", "frame_idx", "n_frames", "frame_digest").orderBy(
        "doc_id", "frame_idx"
    )


@query(
    "q63_modality_rollup",
    oracle=f"""
    WITH feat AS (
      SELECT source,
             CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 512 + 1 AS width,
             CAST('0x' || substr(md5(text), 5, 4) AS BIGINT) % 512 + 1 AS height
      FROM documents
    )
    SELECT source, COUNT(*) AS n,
           CAST(SUM(width * height) AS BIGINT) AS total_pixels,
           CAST(SUM(CASE WHEN width >= height THEN 1 ELSE 0 END) AS BIGINT) AS n_landscape
    FROM feat GROUP BY source ORDER BY source
    """,
    category="multimodal",
)
def q63(spark: SparkSession, sf: str) -> DataFrame:
    """Full-table decode + aggregate: the shape a corpus-wide media
    census runs at scale (decode is map-side; only the per-source
    partial aggregates shuffle)."""
    docs = t(spark, sf, "documents")
    feat = image_features(with_payload(docs.select("source", "text")))
    return (
        feat.groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("width").cast("long") * F.col("height")).alias("total_pixels"),
            F.sum(F.when(F.col("width") >= F.col("height"), 1).otherwise(0))
            .cast("long")
            .alias("n_landscape"),
        )
        .orderBy("source")
    )
