"""Catalog surface: database/table DDL, partition discovery, schema
evolution — the Spark-native replacements for the reference's Glue
resources.

Reference mapping:
- Glue database + external Parquet table (deploy/serverless.yml:458-464,
  :509-567) -> ``create_database`` / ``register_external_table`` (CREATE
  TABLE ... USING parquet ... LOCATION, partitioned by study_date);
- post-load ``MSCK REPAIR TABLE dicom_metadata`` (README.md:105, :139)
  -> ``repair_table`` — the identical statement exists in Spark SQL;
- the Glue crawler re-inferring a widened union schema with
  CombineCompatibleSchemas (deploy/serverless.yml:466-479,
  README.md:120-128) -> ``merged_schema_read`` — Spark's
  ``mergeSchema`` option is the built-in equivalent, no crawler needed.

At scale: a catalog table (vs a bare path read) is what enables
partition pruning by name, statistics, and INSERT-based workflows; MSCK
costs one object-store listing per run and should be replaced by
explicit ``ALTER TABLE ADD PARTITION`` in high-partition-count lakes
(or by writing through the catalog so partitions self-register).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_database(spark: SparkSession, name: str) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def register_external_table(
    spark: SparkSession,
    table: str,
    location: str,
    partition_col: str | None = "study_date",
    database: str | None = None,
) -> str:
    """Declare an external parquet table over an existing lake path and
    discover its partitions. Returns the fully-qualified table name.

    The schema is inferred from the files (the lake was written by us,
    so the canonical schema is already pinned at write time)."""
    fq = f"{database}.{table}" if database else table
    if database:
        create_database(spark, database)
    spark.sql(f"DROP TABLE IF EXISTS {fq}")
    if partition_col:
        # PARTITIONED BY requires an explicit column list; derive it from
        # the lake itself (one footer/listing read, no data scan)
        schema = spark.read.parquet(location).schema
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        spark.sql(
            f"CREATE TABLE {fq} ({cols}) USING parquet "
            f"PARTITIONED BY ({partition_col}) LOCATION '{location}'"
        )
        repair_table(spark, fq)
    else:
        spark.sql(f"CREATE TABLE {fq} USING parquet LOCATION '{location}'")
    return fq


def repair_table(spark: SparkSession, table: str) -> None:
    """Partition discovery — the reference's post-load MSCK step."""
    spark.sql(f"MSCK REPAIR TABLE {table}")


def merged_schema_read(spark: SparkSession, path: str) -> DataFrame:
    """Union-schema read across heterogeneous parquet files — the
    built-in equivalent of the Glue crawler's CombineCompatibleSchemas."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def analyze_table(
    spark: SparkSession, table: str, columns: list[str] | None = None
) -> dict[str, str]:
    """Collect catalog statistics for cost-based optimization: table-
    level row count / size, plus per-column min/max/ndv/null-count
    histograms when ``columns`` is given. With stats present, Catalyst's
    CBO (join reordering, broadcast decisions, AQE estimates) works from
    measured cardinalities instead of raw file sizes — on a 100 TB lake
    the difference between broadcasting a filtered dimension and
    shuffling it. Returns the recorded table stats for inspection.

    (The reference has no statistics story at all — Athena reads Glue
    table properties only if a crawler wrote them.)"""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    stats = {r.col_name: r.data_type for r in rows if r.col_name == "Statistics"}
    return stats
