#!/usr/bin/env python3
"""Round-12 session-2 headline decomposition (guide §1): for each
headline query at sf0.1, split the warm per-pass wall into
(a) DataFrame construction + analysis (spark_fn + schema touch),
(b) optimization+planning (explain cost), and (c) execution (collect),
so the remaining fixed overhead is attributed to driver-side planning
vs job execution before any further change is attempted."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dicom_metadata_extractor_serverless_datalake_spark.queries.corpus import (
    QUERIES,
    headline_queries,
)
from dicom_metadata_extractor_serverless_datalake_spark.session import get_spark
from dicom_metadata_extractor_serverless_datalake_spark.sources.tables import (
    register_star_schema,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="profile-headline-r12")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    register_star_schema(spark, SF_DIR)
    names = list(headline_queries())

    # full warm-up pass
    for name in names:
        QUERIES[name].spark_fn(spark, SF_DIR).collect()

    print(f"{'query':28s} {'build':>7s} {'plan':>7s} {'exec':>7s} {'total':>7s}")
    for name in names:
        builds, plans, execs = [], [], []
        for _ in range(3):
            t0 = time.perf_counter()
            df = QUERIES[name].spark_fn(spark, SF_DIR)
            _ = df.schema  # force analysis
            t1 = time.perf_counter()
            # force optimization + physical planning without execution
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.collect()
            t3 = time.perf_counter()
            builds.append(t1 - t0)
            plans.append(t2 - t1)
            execs.append(t3 - t2)
        b, p, e = min(builds), min(plans), min(execs)
        print(f"{name:28s} {b:7.3f} {p:7.3f} {e:7.3f} {b + p + e:7.3f}")


if __name__ == "__main__":
    main()
