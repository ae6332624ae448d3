#!/usr/bin/env python3
"""Round-10 scale rows (BASELINE.md): one SECTION per fresh JVM (heap
aging inflates repeated-section numbers), cache-clean between passes,
timing INCLUDING query construction, through the noop sink — the
bench_r09_scale.py discipline unchanged.

Covers the round's new queries q281-q290 at 100x their test scale plus
the sketch-only AMS entry point (VERDICT r09 #3) at 5M docs on both
hashes, and a TextCorpus.f2_moment facade pass to pin the facade ==
function wall. q288/q289 are bounded by design (hash sample / 100-doc
slice) — scale-independent, no row needed beyond the 100x point.

Usage: python scripts/bench_r10_scale.py {<section>|all} — see SECTIONS
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOC500K = "/tmp/sfsynthdoc100"
DOC5M = "/tmp/sfsynthdoc1000"
EV10M = "/tmp/evsynth100"
EV100M = "/tmp/evsynth1000"


def _ams_sketch_fast(spark, sf_dir: str):
    """Sketch-only AMS (queries/mining.ams_f2_sketch), production hash:
    the deployment path with NO exact-F2 audit — one scan, no per-word
    shuffle."""
    from dicom_metadata_extractor_serverless_datalake_spark.queries.mining import (
        ams_f2_sketch,
        ams_token_frame,
    )

    return ams_f2_sketch(ams_token_frame(spark, sf_dir), "fast")


def _ams_sketch_portable(spark, sf_dir: str):
    """Sketch-only AMS on the oracle-portable md5 h31 — the premium row
    beside the fast one (q272's registered form keeps the audit)."""
    from dicom_metadata_extractor_serverless_datalake_spark.queries.mining import (
        ams_f2_sketch,
        ams_token_frame,
    )

    return ams_f2_sketch(ams_token_frame(spark, sf_dir), "portable")


def _f2_facade_fast(spark, sf_dir: str):
    """TextCorpus.f2_moment(hash_fn='fast') — pins facade == function."""
    from dicom_metadata_extractor_serverless_datalake_spark.pipeline import TextCorpus
    from dicom_metadata_extractor_serverless_datalake_spark.queries.base import t

    return TextCorpus(t(spark, sf_dir, "documents")).f2_moment(hash_fn="fast")


SECTIONS = {
    # round-10 new-query 100x scale rows
    "newdoc": (
        ["q281_bootstrap_ci", "q285_cramer_von_mises", "q286_chao1_richness",
         "q287_corr_matrix"],
        DOC500K,
        2,
    ),
    "newev": (
        ["q282_jonckheere_trend", "q283_mann_kendall", "q284_runs_test"],
        EV10M,
        2,
    ),
    "newemb": (["q288_jl_distortion"], DOC500K, 2),
    "newmm": (["q289_silence_runs"], DOC500K, 2),
    "str10": (["q290_stream_bootstrap"], DOC500K, 1),
    # 10x stress for the value-domain / pair-frame arithmetic
    "ev100m": (
        ["q282_jonckheere_trend", "q283_mann_kendall", "q284_runs_test"],
        EV100M,
        1,
    ),
    "doc5m": (["q281_bootstrap_ci", "q286_chao1_richness"], DOC5M, 1),
    # sketch-only AMS entry point (VERDICT r09 #3): the 5M-doc walls
    "amssketch": ([_ams_sketch_fast], DOC5M, 2),
    # portable is ~6x the hash cost (BASELINE md5 premium) — one pass
    "amssketchport": ([_ams_sketch_portable], DOC5M, 1),
    "amsfacade": ([_f2_facade_fast], DOC500K, 2),
}


def run_section(section: str) -> None:
    builders, sf_dir, passes = SECTIONS[section]
    if not isinstance(builders, list):
        builders = [builders]
    from dicom_metadata_extractor_serverless_datalake_spark.queries.corpus import QUERIES
    from dicom_metadata_extractor_serverless_datalake_spark.session import get_spark

    spark = get_spark(app_name=f"bench_r10_{section}")
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
