import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from dicom_metadata_extractor_serverless_datalake_spark.session import get_spark

    # shard isolation (scripts/run_tests_parallel.py): each concurrent
    # pytest process gets its own cores and warehouse dir so managed
    # tables (saveAsTable in catalog/bucketing tests) never collide
    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "4")
    extra = {}
    wh = os.environ.get("SPARK_GRAFT_TEST_WAREHOUSE")
    if wh:
        extra["spark.sql.warehouse.dir"] = wh
    spark = get_spark(
        app_name="tests",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf=extra or None,
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
