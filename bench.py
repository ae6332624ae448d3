#!/usr/bin/env python3
"""Bench harness: runs the headline corpus queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed over its full action (plan + execute + collect).
A trivial warm-up job first absorbs JVM/Python-worker startup so the
numbers measure the queries, not session spin-up.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from dicom_metadata_extractor_serverless_datalake_spark.queries.corpus import QUERIES, headline_queries
    from dicom_metadata_extractor_serverless_datalake_spark.session import get_spark

    spark = get_spark(app_name="bench")

    # warm-up: JVM job scheduling + Python worker pool
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(10).mapInArrow(lambda it: it, "id long").count() if hasattr(
        spark.range(10), "mapInArrow"
    ) else None

    names = list(headline_queries()) or list(QUERIES)
    times: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name].spark_fn
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).collect()
        times[name] = round(time.perf_counter() - t0, 3)
        _ = len(rows)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_corpus_total_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
