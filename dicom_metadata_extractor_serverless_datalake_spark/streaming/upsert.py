"""Streaming upsert sink: maintain a latest-per-key Parquet snapshot
from an append stream (the CDC-compaction pattern).

The reference's lake is append-only; re-delivered or corrected rows
accumulate and every reader must re-derive "current state" (the MSCK +
re-query story, README.md:139). This sink does that once, incrementally:
each micro-batch merges into a keyed snapshot via ``foreachBatch``, so
readers see one current row per key.

Mechanics: plain Parquet has no transactional MERGE, so the snapshot is
copy-on-write and versioned — batch N writes ``v{N}/`` next to the
previous version and the reader resolves the highest complete version
(``_SUCCESS`` present). Versioned dirs make the swap atomic on any
filesystem/object store without rename semantics, and stale versions
are pruned after write.

Scale notes: copy-on-write rewrites the full snapshot per batch, which
is right when the keyed state is much smaller than the stream (device
state, user profiles — the common case). For snapshots too large to
rewrite, the same ``foreachBatch`` body would target a format with
merge-on-read (bucketed delta files compacted by operators/compact.py
periodically); the merge expression — window rank over (key, order) —
is unchanged, which is why it lives in its own function here.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """One row per key: the row with the greatest ``order_col``. Ties are
    broken deterministically: the remaining orderable columns (schema
    order, DESC) extend the window sort, so a replayed/re-executed batch
    always picks the same row regardless of partitioning or arrival
    order. (Map-typed columns are unorderable and excluded; rows
    identical in every orderable column are interchangeable anyway.)"""
    from pyspark.sql import types as T

    tiebreak = [
        f.name
        for f in df.schema.fields
        if f.name not in key_cols
        and f.name != order_col
        and not isinstance(f.dataType, T.MapType)
    ]
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(order_col).desc(), *[F.col(c).desc() for c in tiebreak]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def current_snapshot_version(path: str, below: int | None = None) -> int | None:
    """Highest complete version, optionally restricted to versions
    strictly below ``below`` (replay recovery: a replayed batch N must
    re-derive from v{N-1}, never read its own half-committed v{N})."""
    best = None
    if not os.path.isdir(path):
        return None
    for name in os.listdir(path):
        if name.startswith("v") and name[1:].isdigit():
            if os.path.exists(os.path.join(path, name, "_SUCCESS")):
                v = int(name[1:])
                if below is not None and v >= below:
                    continue
                best = v if best is None or v > best else best
    return best


def read_snapshot(
    spark: SparkSession, path: str, below: int | None = None
) -> DataFrame | None:
    v = current_snapshot_version(path, below=below)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(path, f"v{v}"))


def start_upsert_sink(
    stream: DataFrame,
    snapshot_path: str,
    key_cols: list[str],
    order_col: str,
    checkpoint_path: str,
    available_now: bool = True,
    keep_versions: int = 2,
):
    """Run the stream into a latest-per-key snapshot at snapshot_path.

    Exactly-once per batch: the version number is the batch id, so a
    replayed batch (restart after failure between write and checkpoint
    commit) overwrites its own version rather than double-applying."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = latest_per_key(batch_df, key_cols, order_col)
        # previous = highest version strictly below this batch id: on a
        # replay of batch N (crash between v{N} write and checkpoint
        # commit) the merge must re-derive from v{N-1} — reading v{N}
        # itself would both double-apply and overwrite a path being read
        prev = read_snapshot(spark, snapshot_path, below=batch_id)
        merged = latest_per_key(prev.unionByName(delta), key_cols, order_col) if prev is not None else delta
        out = os.path.join(snapshot_path, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(out)
        # prune old versions (keep a read-stable window)
        versions = sorted(
            int(n[1:]) for n in os.listdir(snapshot_path)
            if n.startswith("v") and n[1:].isdigit()
        )
        for v in versions[:-keep_versions]:
            shutil.rmtree(os.path.join(snapshot_path, f"v{v}"), ignore_errors=True)

    writer = stream.writeStream.foreachBatch(merge).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
