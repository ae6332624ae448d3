"""Keyed table reconciliation (data-diff): classify every row of two
table versions as added / removed / changed / unchanged.

The migration-validation primitive: after a rewrite, backfill, or
engine swap, diff the new output against the old by primary key and
aggregate the verdicts. The reference has nothing comparable — its
at-least-once Lambda ingest simply appends and re-runs MSCK
(/root/reference/README.md:139); this is the operator you run to
PROVE a re-ingest converged.

Scale shape at 100 TB:
- one full-outer shuffle on the key columns — both sides hash-
  partition on the same keys, so AQE coalesces and there is no
  residual exchange;
- ``fingerprint=True`` is the wide-table path: each side is reduced
  map-side to (keys, xxhash64(compare columns)) BEFORE the shuffle,
  so the exchange carries 8 bytes of payload per row no matter how
  wide the table is. Equality-by-hash can misclassify a changed row
  as unchanged with probability ~2^-64 per pair (one-sided: added/
  removed/changed verdicts are never produced spuriously) — the
  documented trade for not shuffling the payload. Exact mode ships
  the compared columns and uses per-column null-safe equality.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: suffixes for the compared columns surfaced by exact mode
_L, _R = "_old", "_new"


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare: list[str] | None = None,
    fingerprint: bool = False,
) -> DataFrame:
    """Full-outer diff of ``right`` (new) vs ``left`` (old) by ``keys``.

    Returns one row per key present in either side with a
    ``change_type`` column in {'added','removed','changed','unchanged'}
    ('added' = key only in ``right``). ``compare`` defaults to every
    shared non-key column. Exact mode carries the compared columns
    (suffixed ``_old``/``_new``); ``fingerprint=True`` carries only a
    64-bit row hash per side (see module note on the collision bound).
    Null-safe throughout: NULL == NULL counts as unchanged, matching
    SQL's IS NOT DISTINCT FROM.
    """
    if compare is None:
        shared = set(left.columns) & set(right.columns)
        compare = [c for c in left.columns if c in shared and c not in keys]
    if not compare:
        raise ValueError("table_diff: no columns to compare")

    if fingerprint:
        lc = left.select(*keys, F.xxhash64(*compare).alias("_fp" + _L))
        rc = right.select(*keys, F.xxhash64(*compare).alias("_fp" + _R))
        same = F.col("_fp" + _L).eqNullSafe(F.col("_fp" + _R))
        in_l, in_r = F.col("_fp" + _L), F.col("_fp" + _R)
    else:
        lc = left.select(
            *keys, *[F.col(c).alias(c + _L) for c in compare],
            F.lit(True).alias("_in" + _L),
        )
        rc = right.select(
            *keys, *[F.col(c).alias(c + _R) for c in compare],
            F.lit(True).alias("_in" + _R),
        )
        same = reduce(
            lambda a, b: a & b,
            [F.col(c + _L).eqNullSafe(F.col(c + _R)) for c in compare],
        )
        in_l, in_r = F.col("_in" + _L), F.col("_in" + _R)

    out = (
        lc.join(rc, keys, "full_outer")
        .withColumn(
            "change_type",
            F.when(in_l.isNull(), F.lit("added"))
            .when(in_r.isNull(), F.lit("removed"))
            .when(same, F.lit("unchanged"))
            .otherwise(F.lit("changed")),
        )
    )
    return out.drop("_in" + _L, "_in" + _R) if not fingerprint else out.drop(
        "_fp" + _L, "_fp" + _R
    )


def diff_summary(diff: DataFrame, keys: list[str]) -> DataFrame:
    """Aggregate a :func:`table_diff` result to one row per verdict:
    row count plus the exact integer sum of the first key (a cheap
    content check a reconciliation report can compare across runs)."""
    k = F.col(keys[0]).cast("bigint")
    return (
        diff.groupBy("change_type")
        .agg(F.count("*").alias("n"), F.sum(k).alias("key_sum"))
        .orderBy("change_type")
    )
