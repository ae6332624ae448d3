"""Star-schema testdata loaders + catalog registration.

The reference's query surface is SQL over catalog tables
(deploy/serverless.yml:458-567, README.md:100-112); here the same
surface is Spark SQL over registered views of the driver's parquet
testdata (TESTDATA.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

STAR_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# events.ts is INT64 TIMESTAMP(NANOS) parquet, which Spark's vectorized
# reader rejects outright. We read nanos as long (legacy conf) and floor-
# divide to microseconds — exactly the truncation DuckDB applies reading
# the same file, so both engines see identical timestamps.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        field = df.schema[col]
        if isinstance(field.dataType, T.LongType):
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def load_stream(spark: SparkSession, src_dir: str, name: str = "events") -> DataFrame:
    """Streaming twin of ``load_table``: a file-source stream over a
    directory of parquet files with the same nanos->micros normalization
    (streaming sources require an explicit schema, so we take it from a
    batch read of the same directory)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(src_dir).schema
    df = spark.readStream.schema(schema).parquet(src_dir)
    for col in _NANOS_TS_COLS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, T.LongType):
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def register_star_schema(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns the frames."""
    out = {}
    for name in STAR_TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
