"""As-of (most-recent-prior) join.

Spark has no native ASOF JOIN (SURVEY §2.B flags this gap); the scalable
technique is union + running ``last(..., ignoreNulls)``:

1. tag left rows side=1 and right rows side=0, unify timestamps;
2. sort each key's rows by (ts, side) — side 0 first so a right row at
   exactly the left timestamp is visible (>= semantics);
3. running last() carries the latest right payload forward;
4. keep the left rows.

One shuffle on the join key, no row multiplication, no per-key skew
beyond the data's own — this is O(n log n) per key and survives
arbitrarily many right rows per key, unlike a correlated-subquery or
range-join formulation which is quadratic in the worst case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``on`` key.

    Right payload columns (everything except the key) are carried over,
    including ``right_ts`` itself. ``how='left'`` keeps unmatched left
    rows with null payload; ``'inner'`` drops them. Ties on identical
    (key, ts): the right row wins per >= semantics; multiple right rows
    at the same instant resolve to the one latest in (ts, side) order.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports left|inner, got {how!r}")
    on_list = [on] if isinstance(on, str) else list(on)
    lcols = [c for c in left.columns if c not in on_list]
    rcols = [c for c in right.columns if c not in on_list]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"ambiguous non-key columns in both sides: {sorted(overlap)}")

    rtypes = {f.name: f.dataType for f in right.schema.fields}
    ltypes = {f.name: f.dataType for f in left.schema.fields}

    l2 = left.select(
        *on_list,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in rcols],
    )
    r2 = right.select(
        *on_list,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
        *[F.col(c) for c in rcols],
    )
    combined = l2.unionByName(r2)
    w = (
        Window.partitionBy(*on_list)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = combined.select(
        *on_list,
        "__side",
        *[F.col(c) for c in lcols],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in rcols],
    )
    out = filled.filter(F.col("__side") == 1).drop("__side")
    if how == "inner":
        matched = F.lit(False)
        for c in rcols:
            matched = matched | F.col(c).isNotNull()
        out = out.filter(matched)
    return out
