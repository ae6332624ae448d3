"""Spark ingest job: binary source -> mapInPandas extraction ->
partitioned Parquet lake + quarantine sink.

This is the reference's whole serverless pipeline (S3 event -> Lambda ->
pydicom -> awswrangler Parquet, SURVEY §3.1) as one declarative Spark
job. The Lambda/Batch 500 MB size router (src/app.py:118-184) dissolves:
task scheduling handles all object sizes.

Scale notes (100 TB target):
- one input file = one task by default via binaryFile; for millions of
  small objects, ``sources.binary.read_binary`` can pack many objects
  per partition (listing-based reader) to amortize task overhead.
- extraction is an Arrow-batched mapInPandas (not per-row Python UDF).
- the lake is Hive-partitioned on study_date so Catalyst prunes
  partitions on the query side; writes repartition by the partition
  column first so each task writes few files (avoids the
  small-files explosion of per-task-per-partition writers).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import DICOM_METADATA_SCHEMA, INGEST_SCHEMA, PARTITION_COL
from .extract import extract_records


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in INGEST_SCHEMA.fields]
    for pdf in batches:
        rows: list[dict] = []
        for path, content in zip(pdf["path"], pdf["content"]):
            rows.extend(extract_records(path, bytes(content)))
        if rows:
            yield pd.DataFrame(rows, columns=cols)


def extract_df(binary_df: DataFrame) -> DataFrame:
    """(path, content) binary DataFrame -> canonical metadata rows with an
    ``error`` channel column. Use when the bytes are already in the plan
    (e.g. the binaryFile streaming source)."""
    return binary_df.select("path", "content").mapInPandas(
        _extract_batches, schema=INGEST_SCHEMA
    )


def extract_from_listing(listing: DataFrame, ranged_cap: int | None = None) -> DataFrame:
    """(path, size) listing -> canonical metadata rows, reading AND
    extracting in one Python pass.

    This is the batch-ingest hot path: with a separate read stage the
    raw bytes make two Arrow round-trips (Python read -> JVM -> Python
    extract); fused, bytes are opened and parsed in the same worker and
    only the (small) metadata rows cross back. Per-object I/O (and the
    10 MB ranged .dcm cap) lives worker-side, exactly where it belongs
    on a real cluster doing ranged object-store GETs."""
    from ..sources.binary import DCM_RANGED_READ_BYTES
    from .archives import IGNORED_EXTS, TAR_EXTS, ZIP_EXTS, eval_ext

    cap = ranged_cap if ranged_cap is not None else DCM_RANGED_READ_BYTES
    cols = [f.name for f in INGEST_SCHEMA.fields]

    def _read_extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for path in pdf["path"]:
                ext = eval_ext(path)
                if ext in IGNORED_EXTS:
                    continue
                this_cap = None if ext in ZIP_EXTS | TAR_EXTS else cap
                with open(path, "rb") as fh:
                    content = fh.read(this_cap) if this_cap else fh.read()
                rows.extend(extract_records(path, content))
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return listing.mapInPandas(_read_extract, schema=INGEST_SCHEMA)


def ingest_batch(
    spark: SparkSession,
    input_path: str,
    lake_path: str,
    quarantine_path: str | None = None,
    use_binary_file_source: bool = False,
) -> tuple[int, int]:
    """Batch-ingest every binary object under input_path.

    Returns (lake_rows, quarantined_rows). Equivalent of replaying all S3
    ObjectCreated events (deploy/serverless.yml:195-200) through the
    reference pipeline in one job.

    The default source is the listing-based ranged reader
    (sources.binary.read_binary): it honors the reference's 10 MB ranged
    .dcm read, sees zero-byte objects (binaryFile drops them, losing the
    DLQ contract for empty DICOMDIR), and packs many small objects per
    task. Set ``use_binary_file_source`` for Spark's built-in source."""
    if use_binary_file_source:
        extracted = extract_df(spark.read.format("binaryFile").load(input_path))
    else:
        from ..sources.binary import list_binary_objects

        extracted = extract_from_listing(list_binary_objects(spark, input_path))
    extracted.persist()
    try:
        good = extracted.filter(F.col("error").isNull()).drop("error", "error_log")
        bad = extracted.filter(F.col("error").isNotNull())

        # one job for both counts, off the persisted extraction
        counts = dict(
            extracted.groupBy(F.col("error").isNull().alias("ok")).count().collect()
        )
        n_good, n_bad = int(counts.get(True, 0)), int(counts.get(False, 0))

        # repartition by partition key so each study_date writes from few
        # tasks -> few, large parquet files (small-files control at scale)
        if n_good:
            (
                good.repartition(PARTITION_COL)
                .write.mode("append")
                .partitionBy(PARTITION_COL)
                .parquet(lake_path)
            )
        if quarantine_path and n_bad:
            bad.write.mode("append").parquet(quarantine_path)
    finally:
        extracted.unpersist()
    return n_good, n_bad


def run_ingest(
    spark: SparkSession,
    input_path: str,
    lake_path: str,
    quarantine_path: str | None = None,
    table: str | None = None,
    external: bool = False,
) -> DataFrame:
    """Ingest then register/refresh the lake as a catalog table, returning
    the queryable DataFrame (the Glue-table + MSCK step,
    deploy/serverless.yml:509-567 / README.md:105).

    ``external=True`` registers a persistent partitioned external table
    (partition pruning + MSCK discovery, the full Glue-table analogue);
    default is a session-scoped temp view."""
    ingest_batch(spark, input_path, lake_path, quarantine_path)
    if table and external:
        from ..sources.catalog import register_external_table

        fq = register_external_table(spark, table, lake_path, PARTITION_COL)
        return spark.table(fq)
    # explicit schema: an all-quarantined ingest leaves the lake empty,
    # which would otherwise fail schema inference; it also pins column
    # types independent of what any one partition happens to contain
    if "://" not in lake_path or lake_path.startswith("file:"):
        # an all-quarantined first ingest never wrote the lake; a missing
        # local dir fails even a schema-pinned read, so materialize it
        os.makedirs(lake_path.removeprefix("file:"), exist_ok=True)
    df = spark.read.schema(DICOM_METADATA_SCHEMA).parquet(lake_path)
    if table:
        df.createOrReplaceTempView(table)
    return df
