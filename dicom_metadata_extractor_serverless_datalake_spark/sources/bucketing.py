"""Bucketed tables: pre-shuffled storage for co-located joins.

The one fact-fact shuffle this workload cannot broadcast away is
lineitem ⋈ orders on orderkey (SURVEY §2.B joins row). At 100 TB that
shuffle moves the whole fact table across the network *per query*.
Bucketing amortizes it into the write: both tables hash-distributed
into the same number of buckets on the join key at load time, after
which every equi-join/groupBy on that key is exchange-free — Spark
reads bucket i of both sides into the same task.

Costs: a one-time shuffle at write; bucket count is fixed at write time
(choose for target-cluster parallelism — at 100 TB with ~1000 executors,
4096 buckets keeps ~25 GB/bucket); small-file pressure when many
writers append (mitigate by writing with repartition(bucket_count, key)
first so each task owns whole buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-within-bucket)
    managed table. Sorting by the join key additionally enables
    merge-join without a per-task sort."""
    writer = (
        df.repartition(n_buckets, bucket_col)
        .write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_col: str,
    n_partitions: int | None = None,
) -> None:
    """Write parquet globally range-partitioned and sorted on ``sort_col``
    — the sorted-lake layout. Each file owns a disjoint key range and is
    internally sorted, so parquet row-group min/max stats turn range
    predicates into file- and row-group-level skips (the storage-side
    complement of predicate pushdown). Range partitioning samples the
    key distribution, so output files are even under skew."""
    out = df.repartitionByRange(
        *( [n_partitions, sort_col] if n_partitions else [sort_col] )
    ).sortWithinPartitions(sort_col)
    out.write.mode("overwrite").parquet(path)


def cobucket_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables — exchange-free when both were
    written with the same bucket count on the join key."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
