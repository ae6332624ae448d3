"""Star-schema testdata loaders + catalog registration.

The reference's query surface is SQL over catalog tables
(deploy/serverless.yml:458-567, README.md:100-112); here the same
surface is Spark SQL over registered views of the driver's parquet
testdata (TESTDATA.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

STAR_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_star_schema(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns the frames."""
    out = {}
    for name in STAR_TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
