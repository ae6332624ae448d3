"""Count-Min sketch over a key column, as pure DataFrame operators.

The linear-sketch counterpart to the Misra-Gries summary in
``operators/heavyhitters.py``: ``depth`` independent hash rows, each
``width`` buckets; a key's count is added to one bucket per row and a
point estimate is the MIN over its ``depth`` buckets. CM guarantees
``estimate >= true_count`` always (hash collisions only ever ADD mass),
and ``estimate <= true_count + eps*N`` with probability ``1 -
(1/c)**depth`` per query for ``eps = c/width`` (Cormode & Muthukrishnan,
J. Algorithms 2005). Unlike MG the sketch is a LINEAR transform of the
input, so sketches of disjoint shards merge by plain cell-wise addition
— which is exactly the ``groupBy(row, bucket).sum`` below — and
deletions / weighted updates compose for free.

Spark-first shape: the sketch IS a (depth x width) aggregate — a
DataFrame of (r, bucket, cnt) cells, at most depth*width rows no matter
the input size. Building it shuffles only (r, bucket) pairs (map-side
partial aggregation collapses them per task before the exchange), never
the keys; probing broadcasts the sketch (kilobytes). At 100 TB the
build is one scan + one fixed-size-output shuffle; nothing driver-side.

Hashes are Spark's ``xxhash64(col, seed)`` — deterministic across runs,
partitionings, and cluster sizes, so estimates are reproducible. NULL
keys hash to the per-row seed value, so NULL behaves as one ordinary
(estimable) key rather than being dropped — the over-count guarantee
holds for it like any other.

The reference (per-object ETL, src/app.py:97-189) has no frequency
analytics; this extends the mergeable-sketch family (q90 HLL, q107
KLL, q108 theta, q122 Misra-Gries) with the linear frequency sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col: str, r: int, width: int) -> F.Column:
    """Row-r bucket for a key: xxhash64 seeded by the row index.

    ``pmod`` keeps the bucket non-negative (hash values are signed)."""
    return F.pmod(F.xxhash64(F.col(col), F.lit(r)), F.lit(width))


def count_min_build(df: DataFrame, col: str, width: int = 1024, depth: int = 5) -> DataFrame:
    """Build the sketch: one (r, bucket, cnt) row per non-empty cell.

    One wide scan; the explode emits ``depth`` small integer pairs per
    input row which the partial aggregate collapses map-side, so the
    exchange carries at most tasks * depth * width cells."""
    cells = df.select(
        F.posexplode(
            F.array(*[_bucket(col, r, width) for r in range(depth)])
        ).alias("r", "bucket")
    )
    return cells.groupBy("r", "bucket").agg(F.count("*").alias("cnt"))


def count_min_estimate(
    sketch: DataFrame, probes: DataFrame, col: str, width: int = 1024, depth: int = 5
) -> DataFrame:
    """Point estimates for ``probes[col]``: min over the key's cells.

    ``width``/``depth`` must match the build call. The sketch side is
    broadcast (<= depth*width rows); a probe key whose cell is absent
    from the sketch has true count 0 and estimate 0. Returns the probe
    rows with an ``est`` column appended."""
    keyed = probes.select(
        "*",
        F.posexplode(
            F.array(*[_bucket(col, r, width) for r in range(depth)])
        ).alias("r", "bucket"),
    )
    joined = keyed.join(F.broadcast(sketch), ["r", "bucket"], "left")
    return (
        joined.groupBy(*probes.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def count_min_inner_product(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """Join-size / inner-product estimate from two CM sketches built
    with the SAME (width, depth, col hashing): for each row r,
    ``sum_b cmA[r,b] * cmB[r,b]`` over-counts the true inner product
    ``sum_key cntA(key) * cntB(key)`` (collision cross-terms are
    non-negative), and the min over rows is the estimate — with
    ``est <= true + eps * Na * Nb`` at probability ``1 - (1/c)**depth``
    for ``eps = c/width`` (Cormode & Muthukrishnan §4.2). This is how
    an optimizer prices an equi-join from two fixed-size summaries
    without touching either table. Returns one row ``(est)``; both
    sketches are tiny aggregates, so the join is broadcast-sized."""
    a = sketch_a.withColumnRenamed("cnt", "cnt_a")
    b = sketch_b.withColumnRenamed("cnt", "cnt_b")
    per_r = (
        a.join(b, ["r", "bucket"])  # absent cells contribute 0 to the product
        .groupBy("r")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("ip"))
    )
    return per_r.agg(F.min("ip").alias("est"))
