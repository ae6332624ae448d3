"""Banded interval-overlap join: the range-join operator class.

Joins two DataFrames of [start, end] intervals on overlap
(``a.start <= b.end AND b.start <= a.end``) without ever planning a
BroadcastNestedLoopJoin or CartesianProduct: each interval is exploded
to the fixed-width BANDS it covers, the join is a pure hash equi-join
on (optional equality keys ++ band), and candidate pairs that touch
multiple shared bands are deduplicated before the exact overlap
predicate verifies them. This generalizes the corpus's banding lemma
(q101 point-proximity, q39 as-of, q109 stream-stream interval) from
points to intervals.

The reference has no join operators at all (it delegates queries to
Athena, /root/reference/deploy/serverless.yml:519; Athena/Presto plans
a plain inequality join as a broadcast nested loop) — this is the
scale-safe replacement.

Scale shape at 100 TB:
- shuffle keys are (eq_keys, band) — intervals land only in the bands
  they touch, so co-partitioning is exact, never all-pairs;
- the explode factor is ceil(span / band_width) + 1 per row: pick
  ``band_width`` near the TYPICAL interval span so most rows emit 1-2
  band rows (the classic band-join sizing rule). Long-tail intervals
  fan out linearly, never quadratically;
- dedup of multi-band candidates happens BEFORE verification on the
  pair ids — payload columns are re-attached afterwards only for
  surviving pairs (payload never rides the wide shuffle);
- AQE handles residual band skew (a hot band is a hot key, salted by
  the usual skew machinery if needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    band_width: int,
    id_col: str,
    on: list[str] | None = None,
    start: str = "start",
    end: str = "end",
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """Overlap-join ``left`` and ``right`` on closed intervals
    [``start``, ``end``] (numeric — cast timestamps to epoch units
    first), optionally conjoined with equality keys ``on``.

    ``id_col`` must uniquely identify a row WITHIN each side (per
    ``on`` group); it anchors the multi-band candidate dedup, so
    payload columns never participate in a wide distinct. Returns one
    row per overlapping (id_a, id_b) pair with every non-key column
    suffixed and the equality keys unsuffixed. Intervals must satisfy
    start <= end (violating rows never match, mirroring the SQL
    predicate).
    """
    on = on or []

    def banded(df: DataFrame, side: str) -> DataFrame:
        # integer `div`, not floor(double /): epoch-microsecond values
        # are large enough that a double quotient can round across a
        # band boundary. Any MONOTONIC banding preserves the guarantee
        # (two overlapping intervals share the band of their overlap
        # point), so trunc-toward-zero on negatives is fine too.
        bands = F.sequence(
            F.expr(f"`{start}` div {band_width}"),
            F.expr(f"`{end}` div {band_width}"),
        )
        return df.select(
            *on,
            F.explode(bands).alias("_band"),
            *[F.col(c).alias(c + side) for c in df.columns if c not in on],
        )

    la, rb = suffixes
    a = banded(left, la)
    b = banded(right, rb)
    # verify overlap on the banded rows FIRST (cheap comparisons on
    # already-co-located rows), then collapse multi-band duplicates by
    # pair id — the only distinct is over (eq keys, id_a, id_b)
    pairs = (
        a.join(b, [*on, "_band"])
        .filter(
            (F.col(start + la) <= F.col(end + rb))
            & (F.col(start + rb) <= F.col(end + la))
        )
        .drop("_band")
    )
    return pairs.dropDuplicates([*on, id_col + la, id_col + rb])
