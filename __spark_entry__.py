"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``dicom_metadata_extractor_serverless_datalake_spark.queries`` — this module is
the thin adapter the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _prepared(fn: Callable[[SparkSession, str], DataFrame]):
    """Ship this package to the session's Python workers before running —
    the caller's SparkSession (the driver harness creates its own) may
    not have /root/repo on the worker path, and the mapInPandas-backed
    queries unpickle by module reference executor-side."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from dicom_metadata_extractor_serverless_datalake_spark.session import _ship_package

        _ship_package(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the q01 pricing summary
    (full-scan + wide aggregation, the engine's headline shape)."""
    from dicom_metadata_extractor_serverless_datalake_spark.queries.corpus import QUERIES

    return _prepared(QUERIES["q01_pricing_summary"].spark_fn)(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from dicom_metadata_extractor_serverless_datalake_spark.queries.corpus import get_queries

    return {name: _prepared(fn) for name, fn in get_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for approximate /
    non-SQL-expressible operators -> rows-only check)."""
    from dicom_metadata_extractor_serverless_datalake_spark.queries.corpus import get_oracles

    return get_oracles()
