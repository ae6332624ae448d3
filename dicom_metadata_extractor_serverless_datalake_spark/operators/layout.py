"""Lake maintenance: clustered (sorted) data layout for scan pruning.

Parquet readers skip row groups and whole files using column min/max
statistics, but statistics only prune if values are CLUSTERED — a
randomly-ordered 100 TB table has every file's (min, max) spanning the
whole domain and nothing skips. ``cluster_write`` range-partitions the
frame on the cluster columns and sorts within each partition before
writing, so file-level ranges are (nearly) disjoint: a selective
predicate then touches the few files whose range intersects it. This
is the Spark-native analogue of the OPTIMIZE ... ZORDER/CLUSTER BY
maintenance command in lakehouse systems — for the single-column (or
prefix-ordered) predicates that dominate the corpus, linear clustering
is optimal; interleaved (Z-order) curves only pay off for multi-column
box predicates.

The reference's lake has no layout control at all: one Lambda writes
one Parquet object per input file in arrival order
(/root/reference/src/app.py:44-59), so Athena scans every object and
prunes only on the study_date partition key. Partitioning still covers
the coarse key (``partitionBy``); clustering covers the next key down
WITHOUT exploding the directory count — the standard answer to
"partition by day, cluster by hour/user".

Scale notes: one range-exchange shuffle (sampled boundaries, skew-safe)
plus a per-partition sort that spills; both scale linearly and the job
is embarrassingly restartable per partition. ``repartitionByRange``
samples the cluster keys, so boundaries adapt to the data distribution
— no manual histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cluster_write(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Write ``df`` as Parquet clustered on ``cluster_cols``: range-
    partitioned across ``num_files`` output files (default: the session
    shuffle parallelism) and sorted within each, giving files disjoint
    min/max ranges on the leading cluster column. ``partition_by``
    optionally adds Hive directory partitioning ABOVE the clustering
    (coarse key -> directories, fine key -> file ranges)."""
    spark = df.sparkSession
    n = num_files or int(spark.conf.get("spark.sql.shuffle.partitions"))
    sort_cols = list(partition_by or []) + list(cluster_cols)
    clustered = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)
    writer = clustered.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def file_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of ``column`` per data file, from parquet footer
    statistics only — the reader-side view that decides pruning."""
    import os

    import pyarrow.parquet as pq

    out = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            lo = hi = None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == column and col.statistics is not None:
                        s = col.statistics
                        lo = s.min if lo is None or s.min < lo else lo
                        hi = s.max if hi is None or s.max > hi else hi
            if lo is not None:
                out.append((lo, hi))
    return out


def overlap_fraction(ranges: list[tuple]) -> float:
    """How much of the file set a point predicate touches on average:
    mean over files of (files whose range contains this file's
    midpoint) / files. 1.0 = every file overlaps everything (random
    layout); ~1/n = disjoint clustered layout."""
    if not ranges:
        return 0.0
    hits = 0
    for lo, hi in ranges:
        mid = lo + (hi - lo) / 2
        hits += sum(1 for a, b in ranges if a <= mid <= b)
    return hits / (len(ranges) ** 2)


def prune_files(path: str, column: str, lo, hi) -> tuple[list[str], int]:
    """Reader-side data skipping: the data files under ``path`` whose
    footer [min, max] on ``column`` intersects ``[lo, hi)``, plus the
    total file count. The returned list is what a skipping scan reads;
    footer statistics are trusted the same way a lakehouse stats index
    is (the writer produced them transactionally with the data).

    At 100 TB the stats live in a table/manifest instead of being
    re-walked per query — this helper IS that manifest build (one
    footer read per file, no data pages touched), kept inline here
    because the corpus data fits one listing."""
    import os

    import pyarrow.parquet as pq

    keep: list[str] = []
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            total += 1
            fp = os.path.join(root, f)
            md = pq.ParquetFile(fp).metadata
            fmin = fmax = None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == column and col.statistics is not None:
                        s = col.statistics
                        fmin = s.min if fmin is None or s.min < fmin else fmin
                        fmax = s.max if fmax is None or s.max > fmax else fmax
            # no stats -> cannot prove exclusion -> must read (safety)
            if fmin is None or (fmax >= lo and fmin < hi):
                keep.append(fp)
    return keep, total


def zorder_column(cols: list[str], bits: int = 16):
    """Morton (Z-order) interleave of ``cols`` (non-negative ints,
    ``bits`` significant bits each) as a single BIGINT Column — the
    multi-dimensional clustering key. Linear clustering (cluster_write
    on one column) makes file ranges disjoint on ONE dimension; sorting
    by the interleaved key makes every file cover a small HYPERCUBE of
    the key space, so per-file [min, max] footer stats on EACH
    dimension column stay narrow and a multi-column box predicate
    prunes on all of them at once (the OPTIMIZE ... ZORDER BY pattern).

    Built as a pure bit expression (shift/and/or) — whole-stage
    codegen, no UDF. 2 cols x 16 bits -> 32-bit z-value.
    """
    from pyspark.sql import functions as F

    terms = []
    n = len(cols)
    for b in range(bits):
        for i, c in enumerate(cols):
            # bit b of col i lands at interleaved position b*n + (n-1-i)
            terms.append(
                F.shiftleft(
                    F.shiftright(F.col(c).cast("bigint"), b).bitwiseAND(F.lit(1)),
                    b * n + (n - 1 - i),
                )
            )
    z = terms[0]
    for t in terms[1:]:
        z = z.bitwiseOR(t)
    return z


def prune_files_multi(path: str, preds: list[tuple]) -> tuple[list[str], int]:
    """Multi-dimension data skipping: keep the files whose footer
    [min, max] intersects ``[lo, hi)`` on EVERY (column, lo, hi) in
    ``preds`` — the box-predicate reader for a z-ordered layout. A file
    lacking stats on any predicate column cannot be excluded (safety).
    Returns (files_to_read, total_file_count)."""
    import os

    import pyarrow.parquet as pq

    keep: list[str] = []
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            total += 1
            fp = os.path.join(root, f)
            md = pq.ParquetFile(fp).metadata
            ranges: dict[str, tuple] = {}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    s = col.statistics
                    if s is None or not s.has_min_max:
                        continue
                    name = col.path_in_schema
                    cur = ranges.get(name)
                    ranges[name] = (
                        s.min if cur is None or s.min < cur[0] else cur[0],
                        s.max if cur is None or s.max > cur[1] else cur[1],
                    )
            excluded = False
            for cname, lo, hi in preds:
                r = ranges.get(cname)
                if r is not None and (r[1] < lo or r[0] >= hi):
                    excluded = True
                    break
            if not excluded:
                keep.append(fp)
    return keep, total
