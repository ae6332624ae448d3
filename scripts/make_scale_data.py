#!/usr/bin/env python3
"""Deterministic scale-up of the driver testdata for data-dominated
benchmarking (BASELINE.md "scale" section; bench.py auto-invokes this
when a scale dir is missing).

- ``make_rel_scale(out, factor)``: replicate sf0.1 lineitem/orders
  ``factor`` times with per-copy orderkey offsets (join keys stay
  consistent: copy i shifts both l_orderkey and o_orderkey by
  i * (max_orderkey + 1)). Other tables are copied as-is — 10x orders
  per customer is exactly the per-key growth a bigger tenant produces.
- ``make_doc_scale(out, factor)``: replicate documents/embeddings with
  doc_id/vec_id offsets; replica text carries an " r{i}" suffix so
  replicas are NEAR-dups (shingle sets overlap but differ), preserving
  realistic dedup/LSH candidate structure instead of exact clones.

Everything derives from the driver's sf0.1 parquet with fixed offsets —
no RNG — so any two generations are byte-identical in content.
"""

from __future__ import annotations

import os
import sys

SRC = "/root/testdata/sf0.1"
COPY_TABLES = (
    "region", "nation", "customer", "supplier", "part", "events",
    "documents", "embeddings",
)


def _spark():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dicom_metadata_extractor_serverless_datalake_spark.session import get_spark

    return get_spark(app_name="make_scale_data")


def make_rel_scale(out: str, factor: int, src: str = SRC, spark=None) -> None:
    import shutil

    from pyspark.sql import functions as F

    spark = spark or _spark()
    os.makedirs(out, exist_ok=True)
    for t in COPY_TABLES:
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copy(os.path.join(src, f"{t}.parquet"), dst)

    orders = spark.read.parquet(f"{src}/orders.parquet")
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    base = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    for name, df, key in (("orders", orders, "o_orderkey"), ("lineitem", li, "l_orderkey")):
        parts = [
            df.withColumn(key, F.col(key) + F.lit(i * base)) for i in range(factor)
        ]
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        union.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))


def make_doc_scale(out: str, factor: int, src: str = SRC, spark=None) -> None:
    import shutil

    from pyspark.sql import functions as F

    spark = spark or _spark()
    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part", "events",
              "orders", "lineitem"):
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copy(os.path.join(src, f"{t}.parquet"), dst)

    docs = spark.read.parquet(f"{src}/documents.parquet")
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    doc_base = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    vec_base = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    # ONE scan + explode of a factor-element range per table (a
    # factor-way union blows up Catalyst analysis time at factor=1000);
    # identical content to the per-copy union: copy i shifts the id by
    # i*base and suffixes replica text with " r{i}" (i >= 1 only).
    rep = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__rep")
    du = (
        docs.select("*", rep)
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep").cast("long") * F.lit(doc_base))
        .withColumn(
            "text",
            F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" r"), F.col("__rep").cast("string"))
            ),
        )
        .drop("__rep")
    )
    eu = (
        emb.select("*", rep)
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep").cast("long") * F.lit(vec_base))
        .drop("__rep")
    )
    du.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    eu.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))


def make_events_scale(out: str, factor: int, src: str = SRC, spark=None) -> None:
    """Replicate events ``factor`` times: copy i shifts event_id by
    i*(max+1) and ts by i*31 days, extending the same user population
    longitudinally — sessionization/cohort/proximity state stays
    realistic (per-user density per month is unchanged; the timeline
    grows), instead of stacking 100 identical copies into one month."""
    import shutil

    from pyspark.sql import functions as F

    spark = spark or _spark()
    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copy(os.path.join(src, f"{t}.parquet"), dst)

    ev = spark.read.parquet(f"{src}/events.parquet")
    # keep the driver testdata's TIMESTAMP_NTZ/micros encoding: a plain
    # "timestamp" cast writes INT96 (Spark's default outputTimestampType),
    # which pyarrow round-trips to nanosecond INT64 in the stream-source
    # chunk writer and the streaming reader's schema then mismatches
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    base = ev.agg(F.max("event_id")).collect()[0][0] + 1
    # ONE scan + explode (the doc-scale pattern): a factor-way union
    # blows up Catalyst analysis time at factor=1000. timestampadd
    # preserves TIMESTAMP_NTZ (an interval literal can't take a column
    # multiplier); content is identical to the historical per-copy
    # union — verified row-for-row against a union-generated dir.
    rep = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__rep")
    union = (
        ev.select("*", rep)
        .withColumn(
            "event_id", F.col("event_id") + F.col("__rep").cast("long") * F.lit(base)
        )
        .withColumn("ts", F.expr("timestampadd(DAY, __rep * 31, ts)"))
        .drop("__rep")
    )
    union.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))


_MAKERS = {"rel": make_rel_scale, "doc": make_doc_scale, "events": make_events_scale}
_PROBES = {"rel": "lineitem.parquet", "doc": "documents.parquet", "events": "events.parquet"}


def ensure(path: str, kind: str, factor: int) -> str:
    """Generate ``path`` if missing; returns path. kind: 'rel' | 'doc' | 'events'."""
    probe = os.path.join(path, _PROBES[kind])
    if not os.path.exists(probe):
        _MAKERS[kind](path, factor)
    return path


if __name__ == "__main__":
    kind = sys.argv[1] if len(sys.argv) > 1 else "rel"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfsynth1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    _MAKERS[kind](out, factor)
    print(f"wrote {out} ({kind} x{factor})")
