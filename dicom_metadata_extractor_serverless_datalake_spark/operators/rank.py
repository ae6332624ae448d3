"""Scalable global row numbering: total-order positions without the
single-partition window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY forces every
row through ONE task (Exchange SinglePartition) — fine at 500 rows,
fatal at 100 TB. ``global_positions`` computes the identical numbering
in parallel, the classic two-phase shape:

1. range-repartition + sort within partitions on the (total) order key
   — the same machinery a global ``orderBy`` uses, minus the collapse
   to one partition;
2. count rows per partition (one tiny driver round-trip: one row PER
   PARTITION, not per data row), prefix-sum into offsets;
3. per-partition ``row_number`` (parallel window, partitioned by
   ``spark_partition_id``) + the partition's offset.

The sorted frame is localCheckpoint-ed before step 2 so the partition
assignment the offsets were computed from is exactly the one the final
query reads — range partitioning re-samples bounds per execution, so
without pinning, a row could move partitions between the count and the
numbering.

The order key must be a TOTAL order (include a unique tie-break
column); otherwise positions are partition-order-dependent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_positions(
    df: DataFrame,
    order_cols: list[str | Column],
    position_col: str = "position",
    num_partitions: int | None = None,
) -> DataFrame:
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    sorted_df = (
        df.repartitionByRange(int(n), *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    part_counts = sorted(
        (r["_pid"], r["cnt"])
        for r in sorted_df.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = {}, 0
    for pid, cnt in part_counts:
        offsets[pid] = acc
        acc += cnt
    off_expr = F.coalesce(
        *[F.when(F.col("_pid") == pid, F.lit(off)) for pid, off in offsets.items()],
        F.lit(0),
    ) if offsets else F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        sorted_df.withColumn(
            position_col, (F.row_number().over(w) + off_expr).cast("long")
        )
        .drop("_pid")
    )
