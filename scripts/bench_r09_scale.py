#!/usr/bin/env python3
"""Round-9 scale rows (BASELINE.md): one SECTION per fresh JVM (heap
aging inflates repeated-section numbers), cache-clean between passes,
timing INCLUDING query construction, through the noop sink.

The *fast sections run the SAME operator compositions as the registered
q243/q254 but with ``hash_fn="fast"`` (xxhash64) — the production hash
path; the registered queries pin ``portable`` (md5 h31) because that is
what DuckDB can replay value-for-value. Recording both walls puts the
honest production number beside the driver-verifiable one (VERDICT r08
task #6); q263 at 5M docs is task #8 (first per-token-shuffle query at
that scale).

Usage: python scripts/bench_r09_scale.py {<section>|all} — see SECTIONS
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOC5M = "/tmp/sfsynthdoc1000"


def _q243_fast(spark, sf_dir: str):
    """q243_neardup_star (queries/llm.py:297) with the production hash."""
    from pyspark.sql import functions as F  # noqa: F401

    from dicom_metadata_extractor_serverless_datalake_spark.operators.dedup import (
        estimate_verify,
        lsh_star_edges,
        minhash_signatures,
        shingle_tokens,
    )
    from dicom_metadata_extractor_serverless_datalake_spark.queries.base import t

    docs = t(spark, sf_dir, "documents")
    sigs = minhash_signatures(shingle_tokens(docs), hash_fn="fast").persist()
    edges = lsh_star_edges(sigs)
    return estimate_verify(edges, sigs, threshold=0.5).orderBy("d1", "d2")


def _q254_fast(spark, sf_dir: str):
    """q254_diversity_sample_star (queries/llm.py:1225) with the
    production hash."""
    from dicom_metadata_extractor_serverless_datalake_spark.operators.dedup import (
        lsh_star_edges,
        minhash_signatures,
        shingle_tokens,
    )
    from dicom_metadata_extractor_serverless_datalake_spark.queries.base import t
    from dicom_metadata_extractor_serverless_datalake_spark.queries.llm import _cluster_balanced_keep

    docs = t(spark, sf_dir, "documents")
    sigs = minhash_signatures(shingle_tokens(docs), hash_fn="fast")
    edges = lsh_star_edges(sigs)
    return _cluster_balanced_keep(docs, edges)


def _q272_fast(spark, sf_dir: str):
    """q272_ams_f2's sketch side with production xxhash64 signs (the
    oracle-portable md5 h31 is the measured 119 s cost at 500k docs;
    this is what a deployment would run). Audit tail = the shared
    queries.mining.ams_audit_tail, same as q272/q280."""
    from pyspark.sql import functions as F

    from dicom_metadata_extractor_serverless_datalake_spark.queries.mining import (
        ams_audit_tail,
        ams_token_frame,
    )

    tok = ams_token_frame(spark, sf_dir)
    sk = tok.agg(
        *[
            F.sum(
                F.lit(1) - F.lit(2) * F.expr(f"xxhash64(concat('ams{j}-', w)) & 1")
            )
            .cast("long")
            .alias(f"x{j}")
            for j in range(8)
        ]
    )
    return ams_audit_tail(sk, tok)


SECTIONS = {
    # (builder, data_dir, passes); builder is a registered query name or
    # one of the fast-path compositions above
    "q243": ("q243_neardup_star", DOC5M, 1),
    "q243fast": (_q243_fast, DOC5M, 1),
    "q254fast": (_q254_fast, DOC5M, 1),
    "q263": ("q263_substring_dedup", DOC5M, 1),
    # round-9 new-query 100x scale rows (q275 is a bounded 100-doc
    # slice by design — scale-independent, no row needed)
    "newdoc": (
        ["q271_average_precision", "q272_ams_f2", "q277_simpson_diversity"],
        "/tmp/sfsynthdoc100",
        2,
    ),
    "newev": (["q273_levene_spread", "q274_friedman_test"], "/tmp/evsynth100", 2),
    "newrel": (["q276_fk_integrity"], "/tmp/sfsynth10", 2),
    "newdoc2": (["q278_vocab_growth", "q279_fisher_scores"], "/tmp/sfsynthdoc100", 2),
    "str9": (["q280_stream_ams"], "/tmp/sfsynthdoc100", 1),
    "amsfast": ([_q272_fast], "/tmp/sfsynthdoc100", 2),
    # 5M-doc stress for this round's restructured/added arithmetic:
    # q257's factor-split chi2 with 10x bigger marginals, RAKE's
    # island windows, and the AMS sketch on the production hash
    "doc5m9": (["q257_chi2_collocations", "q265_rake_keywords", _q272_fast], DOC5M, 1),
    # 100M-event stress for the round's k-sample tests (10x their rows)
    "ev1000b": (["q273_levene_spread", "q274_friedman_test"], "/tmp/evsynth1000", 1),
}


def run_section(section: str) -> None:
    builders, sf_dir, passes = SECTIONS[section]
    if not isinstance(builders, list):
        builders = [builders]
    from dicom_metadata_extractor_serverless_datalake_spark.queries.corpus import QUERIES
    from dicom_metadata_extractor_serverless_datalake_spark.session import get_spark

    spark = get_spark(app_name=f"bench_r09_{section}")
    for builder in builders:
        fn = QUERIES[builder].spark_fn if isinstance(builder, str) else builder
        label = builder if isinstance(builder, str) else builder.__name__
        walls, rows = [], None
        for _ in range(passes):
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
            if rows is None and passes >= 2:
                rows = df.count()  # cheap relative to the warm pass
        print(
            f"RESULT {section} {label}: wall={min(walls):.1f}s "
            f"(passes={[f'{w:.1f}' for w in walls]}) rows={rows}",
            flush=True,
        )
    spark.stop()


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which != "all":
        run_section(which)
        return
    # fresh JVM per section: re-exec ourselves
    import subprocess

    for section in SECTIONS:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), section], check=False
        )


if __name__ == "__main__":
    main()
