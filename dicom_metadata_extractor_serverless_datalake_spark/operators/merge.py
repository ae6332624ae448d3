"""SCD2 (slowly-changing-dimension, type 2) build and incremental
merge over a change stream: the lake-side MERGE/upsert pattern.

The reference's lake is append-only partitioned Parquet with no update
path (SURVEY §2.A#19; src/app.py writes, Athena reads) — but any
dimension a real pipeline joins against (customer segment, document
license, source quality tier) changes over time, and the standard lake
answer is an SCD2 table: one row per (key, attribute-run) with a
``[valid_from, valid_to)`` interval, ``valid_to IS NULL`` marking the
current row.

Two operators:

- :func:`scd2_build` — full build from a change stream: collapse
  consecutive same-value changes per key, then derive each run's
  interval. Two window passes over ONE ``(key)`` shuffle (the second
  window reuses the first's partitioning — no extra exchange).
- :func:`scd2_merge` — the incremental path a 100 TB pipeline actually
  runs: given an existing SCD2 table and a delta of new changes, only
  the keys PRESENT IN THE DELTA are rebuilt (their historical change
  points are recovered from their existing rows — ``valid_from`` IS the
  change point, so no raw-history rescan); untouched keys pass through
  by anti-join. Cost scales with |delta keys|, not |dimension|.

Correctness obligation (certified by q123's oracle): because the
consecutive-dup collapse keeps the FIRST row of each run, it is
idempotent on an already-collapsed prefix, so

    scd2_merge(scd2_build(base), delta) == scd2_build(base ∪ delta)

row-for-row — the IVM property, same shape as q119's partial-state
merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCD2_COLS = ("key", "attr", "seq", "valid_from", "valid_to")


def scd2_build(
    changes: DataFrame,
    key: str = "key",
    attr: str = "attr",
    eff: str = "eff",
    seq: str = "seq",
) -> DataFrame:
    """Full SCD2 build from ``(key, attr, eff, seq)`` change rows.

    ``seq`` breaks ties among equal ``eff`` timestamps (must be unique
    per key; an ingest sequence number or source row id). Returns
    ``(key, attr, seq, valid_from, valid_to)`` — ``seq`` is retained so
    :func:`scd2_merge` can re-collapse deterministically; callers drop
    it for presentation.
    """
    w = Window.partitionBy(key).orderBy(eff, seq)
    runs = (
        changes.select(
            F.col(key).alias("key"),
            F.col(attr).alias("attr"),
            F.col(eff).alias("eff"),
            F.col(seq).alias("seq"),
        )
        .withColumn("_prev", F.lag("attr").over(Window.partitionBy("key").orderBy("eff", "seq")))
        .filter(F.col("_prev").isNull() | (F.col("attr") != F.col("_prev")))
        .drop("_prev")
    )
    w2 = Window.partitionBy("key").orderBy("eff", "seq")
    return runs.select(
        "key",
        "attr",
        "seq",
        F.col("eff").alias("valid_from"),
        F.lead("eff").over(w2).alias("valid_to"),
    )


def scd2_merge(scd2: DataFrame, delta: DataFrame, **kw) -> DataFrame:
    """Incremental SCD2 maintenance: apply ``delta`` change rows (same
    shape as :func:`scd2_build`'s input) to an existing SCD2 table.

    Only delta keys are rebuilt; all other keys pass through untouched
    (anti-join — at scale this is the partition-pruned path, and the
    rebuilt side shuffles |delta keys| rows, not the dimension)."""
    d = delta.select(
        F.col(kw.get("key", "key")).alias("key"),
        F.col(kw.get("attr", "attr")).alias("attr"),
        F.col(kw.get("eff", "eff")).alias("eff"),
        F.col(kw.get("seq", "seq")).alias("seq"),
    )
    affected = d.select("key").distinct()
    untouched = scd2.join(affected, "key", "left_anti")
    # an SCD2 row's (valid_from, attr, seq) IS its originating change
    # point — recover them instead of rescanning raw history
    base_pts = scd2.join(affected, "key", "left_semi").select(
        "key", "attr", F.col("valid_from").alias("eff"), "seq"
    )
    rebuilt = scd2_build(base_pts.unionByName(d))
    return untouched.unionByName(rebuilt)
