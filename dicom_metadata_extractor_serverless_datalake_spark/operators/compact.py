"""Lake maintenance: small-files compaction for partitioned Parquet.

Streaming ingest (streaming/ingest_stream.py) writes a few files per
micro-batch per partition; after days of running, a partition holds
thousands of KB-sized files and scan task-scheduling overhead dominates
(the classic small-files problem — the reference had it too: one Lambda
invocation wrote one Parquet object per input file, README.md:103).

``compact_partition`` rewrites one partition's files into
ceil(bytes / target_file_bytes) files, atomically: write to a temp dir
beside the partition, then swap. ``compact_lake`` sweeps every
partition that exceeds a file-count threshold.

Scale notes: compaction is per-partition independent — on a real
cluster you run many partitions' rewrites in one job (each partition is
a task group), and only partitions past the threshold are touched, so
steady-state cost tracks ingest rate, not lake size. The replacement
dir is fully materialized first, then swapped in with a single pair of
renames: a reader sees the old file set or the complete new one — the
only exposure is the two-syscall gap between the renames, during which
a lister may transiently miss the partition (POSIX has no two-dir
atomic exchange; with object-store semantics a manifest/catalog pointer
swap replaces the renames — the code isolates the swap in one place for
that reason).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def partition_file_stats(lake_path: str) -> dict[str, tuple[int, int]]:
    """partition dir name -> (n_files, total_bytes) for a one-level
    Hive-partitioned lake."""
    out: dict[str, tuple[int, int]] = {}
    for entry in sorted(os.listdir(lake_path)):
        pdir = os.path.join(lake_path, entry)
        if not (os.path.isdir(pdir) and "=" in entry):
            continue
        files = [
            f for f in os.listdir(pdir)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        total = sum(os.path.getsize(os.path.join(pdir, f)) for f in files)
        out[entry] = (len(files), total)
    return out


def compact_partition(
    spark: SparkSession,
    lake_path: str,
    partition: str,
    target_file_bytes: int = 128 << 20,
) -> int:
    """Rewrite one partition (``"study_date=2021-11-03"``) into
    ~target-sized files. Returns the new file count."""
    pdir = os.path.join(lake_path, partition)
    _files, total = partition_file_stats(lake_path)[partition]
    n_out = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(pdir)
    tmp = os.path.join(lake_path, f"_compact_{uuid.uuid4().hex}")
    df.coalesce(n_out).write.parquet(tmp)
    # strip sink markers so the replacement dir holds exactly the data
    # files BEFORE it goes live — the swap below is then two renames
    # back-to-back, so a concurrent reader sees either the old file set
    # or the complete new one, never a partially-populated partition
    for f in os.listdir(tmp):
        if not f.endswith(".parquet"):
            os.remove(os.path.join(tmp, f))
    swap = os.path.join(lake_path, f"_old_{uuid.uuid4().hex}")
    os.rename(pdir, swap)
    try:
        os.rename(tmp, pdir)
    except Exception:
        os.rename(swap, pdir)  # roll back
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(swap, ignore_errors=True)
    return sum(1 for f in os.listdir(pdir) if f.endswith(".parquet"))


def compact_lake(
    spark: SparkSession,
    lake_path: str,
    target_file_bytes: int = 128 << 20,
    min_files: int = 8,
) -> dict[str, int]:
    """Compact every partition holding at least ``min_files`` files.
    Returns partition -> new file count for the partitions touched."""
    done: dict[str, int] = {}
    for partition, (n_files, _total) in partition_file_stats(lake_path).items():
        if n_files >= min_files:
            done[partition] = compact_partition(
                spark, lake_path, partition, target_file_bytes
            )
    return done
