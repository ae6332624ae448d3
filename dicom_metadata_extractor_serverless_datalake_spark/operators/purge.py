"""Right-to-erasure DELETE for a partitioned Parquet lake.

Plain Parquet has no DELETE: compliance erasure (GDPR art. 17 / HIPAA
amendment requests) on the reference's lake means "rewrite the objects
without the rows" — which is exactly what this operator does, bounded
to the partitions that actually contain matches:

1. one partition-pruned scan finds the affected partition values and
   counts the matching rows (driver state is bounded by |partitions|,
   never by rows);
2. the keep-set of ONLY those partitions is rewritten to a staging dir
   beside the lake (one Spark job, partitioned like the lake);
3. each affected partition directory is swapped old->new (the same
   rename-pair discipline as operators/compact.py — a reader sees the
   old file set or the complete new one); partitions whose rows were
   all purged are removed outright.

Unaffected partitions are never read past the pruned match scan and
their files are never touched — at 100 TB the cost is proportional to
the data that contains the subject, not to the lake. Spark cannot
express this as a self-overwrite (`mode("overwrite")` on a path being
read raises AnalysisException; dynamic partition overwrite also cannot
drop now-empty partitions), hence the explicit stage-and-swap.

The predicate must be deterministic (it runs twice: once to find
matches, once negated to build the keep-set).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def purge_rows(
    spark: SparkSession,
    lake_path: str,
    predicate: Column,
    partition_col: str = "study_date",
    schema=None,
) -> dict[str, int]:
    """Delete every row matching ``predicate`` from a one-level
    Hive-partitioned Parquet lake. Returns
    ``{rows_purged, rows_kept_in_rewritten, partitions_rewritten,
    partitions_removed}``.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(lake_path)

    # 1. bounded driver state: affected partition values + match count
    matches = df.filter(predicate)
    affected = [r[0] for r in matches.select(partition_col).distinct().collect()]
    if not affected:
        return {
            "rows_purged": 0,
            "rows_kept_in_rewritten": 0,
            "partitions_rewritten": 0,
            "partitions_removed": 0,
        }
    pruned = df.filter(F.col(partition_col).isin(affected))
    n_purged = pruned.filter(predicate).count()
    kept = pruned.filter(~predicate)
    n_kept = kept.count()

    # 2. stage the keep-set of the affected partitions only
    staging = f"{lake_path.rstrip('/')}.purge-{uuid.uuid4().hex}"
    kept.write.mode("overwrite").partitionBy(partition_col).parquet(staging)

    # 3. swap per affected partition; emptied partitions disappear
    rewritten = removed = 0
    try:
        for value in affected:
            pdir = f"{partition_col}={value}"
            src = os.path.join(staging, pdir)
            dst = os.path.join(lake_path, pdir)
            tomb = f"{dst}.purged-{uuid.uuid4().hex}"
            os.rename(dst, tomb)
            if os.path.isdir(src):
                os.rename(src, dst)
                rewritten += 1
            else:
                removed += 1  # every row of this partition matched
            shutil.rmtree(tomb)
    finally:
        shutil.rmtree(staging, ignore_errors=True)

    return {
        "rows_purged": n_purged,
        "rows_kept_in_rewritten": n_kept,
        "partitions_rewritten": rewritten,
        "partitions_removed": removed,
    }


def purge_unpartitioned(
    spark: SparkSession,
    path: str,
    predicate: Column,
    schema=None,
) -> dict[str, int]:
    """Erasure for an unpartitioned Parquet directory (the quarantine
    channel — failed objects carry source keys and parse-error text
    that can embed subject identifiers, so right-to-erasure must reach
    the DLQ too). Full rewrite-and-swap: the quarantine holds failures
    only, so "full" is small by construction; a lake-sized frame should
    be partitioned and use :func:`purge_rows` instead."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    n_purged = df.filter(predicate).count()
    if n_purged == 0:
        return {"rows_purged": 0, "rows_kept": df.count()}
    kept = df.filter(~predicate)
    n_kept = kept.count()
    staging = f"{path.rstrip('/')}.purge-{uuid.uuid4().hex}"
    kept.write.mode("overwrite").parquet(staging)
    tomb = f"{path.rstrip('/')}.purged-{uuid.uuid4().hex}"
    os.rename(path, tomb)
    os.rename(staging, path)
    shutil.rmtree(tomb)
    return {"rows_purged": n_purged, "rows_kept": n_kept}
