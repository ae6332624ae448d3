#!/usr/bin/env python3
"""Bench harness: runs the headline corpus queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology: one untimed warm-up pass executes every headline query
end-to-end (absorbing JVM/codegen/Python-worker startup and OS page
cache), then the reported number is the per-query MIN over two timed
steady-state passes — this host shows intermittent ~100 s scheduler
stalls, and min-of-N is the standard way to read sustained throughput
through that noise (a stall can only inflate a sample, never deflate
it). Cold (first-run) times are reported under "cold_queries".
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
    from dicom_metadata_extractor_serverless_datalake_spark.sources.tables import register_star_schema

    spark = get_spark(app_name="bench")

    # warm-up: JVM job scheduling + catalog registration
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    register_star_schema(spark, sf_dir)

    names = list(headline_queries()) or list(QUERIES)

    cold: dict[str, float] = {}
    for name in names:  # cold pass (also the warm-up for the timed pass)
        t0 = time.perf_counter()
        rows = QUERIES[name].spark_fn(spark, sf_dir).collect()
        cold[name] = round(time.perf_counter() - t0, 3)
        _ = len(rows)

    times: dict[str, float] = {}
    for _pass in range(2):  # steady-state: per-query min of 2 passes
        for name in names:
            t0 = time.perf_counter()
            rows = QUERIES[name].spark_fn(spark, sf_dir).collect()
            dt = round(time.perf_counter() - t0, 3)
            if name not in times or dt < times[name]:
                times[name] = dt
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
                "cold_queries": cold,
                "cold_total_sec": round(sum(cold.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
