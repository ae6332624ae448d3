#!/usr/bin/env python3
"""Micro-benchmark: connected_components wall time on a saved pair list.

Materializes the near-dup candidate pairs of the 100x document corpus
once (estimate-verified — cheap, same edge structure) to parquet, then
times dedup_clusters end-to-end N trials. Used for the round-4 A/B of
edge-partitioning reuse across label-propagation rounds.

Usage: python scripts/bench_cc.py [--trials 2] [--pairs /tmp/cc_pairs.parquet]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--pairs", default="/tmp/cc_pairs.parquet")
    ap.add_argument("--factor", type=int, default=100)
    args = ap.parse_args()

    from make_scale_data import ensure

    from dicom_metadata_extractor_serverless_datalake_spark.operators.cluster import dedup_clusters
    from dicom_metadata_extractor_serverless_datalake_spark.operators.dedup import neardup_pairs
    from dicom_metadata_extractor_serverless_datalake_spark.session import get_spark

    spark = get_spark(app_name="bench_cc")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if not os.path.exists(os.path.join(args.pairs, "_SUCCESS")):
        scale_dir = ensure(f"/tmp/sfsynthdoc{args.factor}", "doc", args.factor)
        docs = spark.read.parquet(os.path.join(scale_dir, "documents.parquet"))
        pairs = neardup_pairs(docs, hash_fn="fast", verify="estimate").select("d1", "d2")
        pairs.write.mode("overwrite").parquet(args.pairs)

    pairs = spark.read.parquet(args.pairs)
    n_edges = pairs.count()
    times = []
    for _ in range(args.trials):
        t0 = time.perf_counter()
        n = dedup_clusters(pairs).count()
        times.append(round(time.perf_counter() - t0, 2))
    print(json.dumps({"edges": n_edges, "clustered_nodes": n, "trials": times, "min": min(times)}))


if __name__ == "__main__":
    main()
