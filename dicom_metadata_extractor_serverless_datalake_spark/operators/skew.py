"""Skew-mitigation operators: salted join and salted aggregation.

AQE's skew-join handling (spark.sql.adaptive.skewJoin, on by default in
our session factory) splits oversized shuffle partitions at runtime and
is the first line of defense. Salting is the *explicit* fallback for the
cases AQE can't fix: a broadcast-ineligible join where one key holds a
double-digit percentage of all rows (the classic null-key / power-law
customer), or a groupBy whose hot key saturates one reducer.

``salted_join`` replicates each right-side row ``salt`` times and
scatters left rows uniformly across the replicas, turning one hot
shuffle partition into ``salt`` even ones at the cost of a ``salt``-times
larger right side — so use it for moderate-size right sides only (a
truly small right side should just broadcast).

``salted_agg_count`` shows the two-phase pattern for aggregations whose
merge function is associative: pre-aggregate on (key, salt), then merge
per key — the hot key's load spreads across ``salt`` reducers in phase 1
and phase 2 only sees ``salt`` partial rows per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left side's hot keys spread across
    ``salt`` shuffle partitions. Result equals ``left.join(right, on,
    how)`` for 'inner'/'left' (the supported modes)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    salted_left = left.withColumn(
        "_salt", (F.rand(seed=7) * salt).cast("int")
    )
    replicas = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_left.join(replicas, [on, "_salt"], how)
    return out.drop("_salt")


def salted_agg_count(
    df: DataFrame,
    key: str,
    agg_col: str | Column | None = None,
    salt: int = 16,
) -> DataFrame:
    """Two-phase count/sum per key: phase 1 aggregates (key, salt) —
    spreading a hot key over ``salt`` reducers — phase 2 merges the
    partials. Returns (key, n, total?) with ``total`` present when
    ``agg_col`` is given.

    Note: Spark's own hash aggregate already does map-side partial
    aggregation, which usually makes explicit salting unnecessary for
    counts; this exists for aggregates carried through operators that
    defeat partial aggregation (e.g. collect_list pipelines)."""
    salted = df.withColumn("_salt", (F.rand(seed=7) * salt).cast("int"))
    phase1_aggs = [F.count(F.lit(1)).alias("_n")]
    if agg_col is not None:
        c = F.col(agg_col) if isinstance(agg_col, str) else agg_col
        phase1_aggs.append(F.sum(c).alias("_s"))
    partial = salted.groupBy(key, "_salt").agg(*phase1_aggs)
    phase2 = [F.sum("_n").alias("n")]
    if agg_col is not None:
        phase2.append(F.sum("_s").alias("total"))
    return partial.groupBy(key).agg(*phase2)
