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


def grouped_positions(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str | Column],
    position_col: str = "position",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group row numbering (1..n within each group) WITHOUT the
    one-task-per-group funnel of ``row_number() OVER (PARTITION BY
    group)``: a window partitioned by a low-cardinality stratum (e.g.
    language) routes each stratum's entire mass through a single task
    — fine at test scale, fatal when one stratum holds billions of
    rows. Same two-phase shape as :func:`global_positions`, range-
    partitioned on (group, order) so each group spans a RUN of
    partitions and every partition still fills in parallel:

    1. range-repartition + local sort on (group_cols + order_cols),
       pinned with localCheckpoint;
    2. per-(partition, group) counts — one driver row per (partition,
       group-run boundary), prefix-summed into offsets per group;
    3. offsets rejoin by broadcast on (partition, group); local
       row_number within (partition, group) + offset.

    order_cols must totally order rows WITHIN a group (include a
    unique tie-break)."""
    gcols = [F.col(c) for c in group_cols]
    ocols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    sorted_df = (
        df.repartitionByRange(int(n), *gcols, *ocols)
        .sortWithinPartitions(*gcols, *ocols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = sorted_df.groupBy("_pid", *gcols).agg(F.count("*").alias("_cnt")).collect()
    # prefix-sum per group across partitions (pid order = range order)
    by_group: dict[tuple, list] = {}
    for r in counts:
        by_group.setdefault(tuple(r[c] for c in group_cols), []).append(
            (r["_pid"], r["_cnt"])
        )
    rows = []
    for g, parts in by_group.items():
        acc = 0
        for pid, cnt in sorted(parts):
            rows.append((pid, *g, acc))
            acc += cnt
    spark = df.sparkSession
    off_schema = sorted_df.select("_pid", *gcols).schema.add("_goff", "long")
    offsets = spark.createDataFrame(rows, off_schema)
    # null-safe equality on the group keys: a NULL stratum is a real
    # group (groupBy counted it above), but a plain equi-join would
    # never match NULL to NULL and silently drop its rows
    renamed = offsets.select(
        F.col("_pid").alias("_opid"),
        *[F.col(c).alias(f"_og_{c}") for c in group_cols],
        "_goff",
    )
    cond = F.col("_pid") == F.col("_opid")
    for c in group_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_og_{c}"))
    w = Window.partitionBy("_pid", *gcols).orderBy(*ocols)
    return (
        sorted_df.join(F.broadcast(renamed), cond)
        .withColumn(position_col, (F.row_number().over(w) + F.col("_goff")).cast("long"))
        .drop("_pid", "_opid", "_goff", *[f"_og_{c}" for c in group_cols])
    )
