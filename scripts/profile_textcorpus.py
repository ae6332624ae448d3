#!/usr/bin/env python3
"""Per-stage profile of the TextCorpus pipeline at scale.

Breaks the end-to-end dedup pipeline (BASELINE.md records 538 s for
500k docs on local[32]) into its physical stages, materializing each
intermediate with persist()+count so a stage's wall time is its OWN
cost, not a replay of everything upstream:

    1. read + exact-dedup survivors
    2. shingle -> MinHash signatures       (one row per doc)
    3. LSH band candidate pairs            (the ~25M-pair set)
    4. exact Jaccard verification          (candidate pairs only)
    5. connected-components clustering     (per-round change counts)
    6. loser anti-join -> deduped corpus
    7. quality_filter + redact_pii + 90/5/5 split counts

Prints one JSON line with per-stage seconds, row counts, and the CC
round trace. Usage:

    python scripts/profile_textcorpus.py [--factor 100] [--dir /tmp/sfsynthdoc100]
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
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--dir", default=None)
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--verify", choices=("exact", "estimate"), default="exact")
    ap.add_argument("--candidates", choices=("pairs", "star"), default="pairs")
    args = ap.parse_args()
    scale_dir = args.dir or f"/tmp/sfsynthdoc{args.factor}"

    from make_scale_data import ensure

    from dicom_metadata_extractor_serverless_datalake_spark.operators.cluster import connected_components
    from dicom_metadata_extractor_serverless_datalake_spark.operators.dedup import (
        estimate_verify,
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_tokens,
    )
    from dicom_metadata_extractor_serverless_datalake_spark.pipeline import TextCorpus
    from dicom_metadata_extractor_serverless_datalake_spark.session import get_spark
    from pyspark.sql import functions as F

    ensure(scale_dir, "doc", args.factor)
    spark = get_spark(app_name="profile_textcorpus")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    out: dict = {
        "factor": args.factor,
        "verify": args.verify,
        "candidates": args.candidates,
        "stages": {},
        "counts": {},
    }

    def stage(name: str, df, count_col: str | None = None):
        t0 = time.perf_counter()
        df = df.persist()
        n = df.count()
        out["stages"][name] = round(time.perf_counter() - t0, 2)
        out["counts"][name] = n
        return df

    t_all = time.perf_counter()

    docs = spark.read.parquet(os.path.join(scale_dir, "documents.parquet"))
    corpus = TextCorpus(docs)
    survivors = stage("1_dedup_exact", corpus.dedup_exact().df)

    tok = shingle_tokens(survivors)
    sigs = stage("2_minhash_signatures", minhash_signatures(tok, hash_fn="fast"))
    if args.candidates == "star":
        from dicom_metadata_extractor_serverless_datalake_spark.operators.dedup import (
            lsh_band_rows,
            lsh_star_edges,
        )

        # analytic all-pairs volume from bucket sizes — what mode=pairs
        # WOULD have generated, without materializing it: sum c(c-1)/2
        # over (band, sig) buckets (upper bound: pre-distinct volume)
        buckets = (
            lsh_band_rows(sigs)
            .groupBy("band", "sig")
            .agg(F.count("*").alias("c"))
        )
        vol = buckets.agg(
            F.sum(F.expr("c * (c - 1) div 2")).alias("pairs"),
            F.sum(F.expr("c - 1")).alias("star"),
            F.max("c").alias("max_bucket"),
        ).collect()[0]
        out["pairs_volume_would_be"] = int(vol["pairs"] or 0)
        out["star_volume_bound"] = int(vol["star"] or 0)
        out["max_bucket"] = int(vol["max_bucket"] or 0)
        cands = stage("3_lsh_candidates", lsh_star_edges(sigs))
    else:
        cands = stage("3_lsh_candidates", lsh_candidate_pairs(sigs))
    if args.verify == "estimate":
        pairs = stage("4_estimate_verify", estimate_verify(cands, sigs, args.threshold))
    else:
        pairs = stage("4_jaccard_verify", jaccard_verify(cands, tok, args.threshold))

    t0 = time.perf_counter()
    cc_stats: dict = {}
    cc = connected_components(pairs, src="d1", dst="d2", stats=cc_stats).persist()
    n_clustered = cc.count()
    out["stages"]["5_connected_components"] = round(time.perf_counter() - t0, 2)
    out["counts"]["5_connected_components"] = n_clustered
    out["cc_rounds"] = cc_stats.get("rounds")
    out["cc_changed_per_round"] = cc_stats.get("changed")

    t0 = time.perf_counter()
    losers = cc.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias("doc_id")
    )
    deduped = TextCorpus(survivors.join(losers, "doc_id", "left_anti")).persist()
    out["counts"]["6_deduped_docs"] = deduped.df.count()
    out["stages"]["6_anti_join"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    clean = deduped.quality_filter(min_chars=100).redact_pii().persist()
    out["counts"]["7_clean_docs"] = clean.df.count()
    splits = clean.split({"train": 90, "val": 5, "test": 5}, salt="v1")
    out["counts"]["7_split"] = {k: v.count() for k, v in splits.items()}
    out["stages"]["7_filter_redact_split"] = round(time.perf_counter() - t0, 2)

    out["total_sec"] = round(time.perf_counter() - t_all, 2)
    out["stage_sum_sec"] = round(sum(out["stages"].values()), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
