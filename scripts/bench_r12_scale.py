#!/usr/bin/env python3
"""Round-12 scale rows: one SECTION per fresh JVM (heap aging inflates
repeated-section numbers), cache-clean between passes, timing INCLUDING
query construction, through the noop sink — the bench_r09/r10/r11_scale
discipline unchanged.

Unlike the r11 harness this one reports EVERY pass wall (not min):
q263's target this round is the AGED-HEAP pass (VERDICT r11 #2 — pass 1
must come within 1.5x of pass 0 at 5M docs), so the pass-to-pass decay
is the measurement, not noise.

Usage: python scripts/bench_r12_scale.py {<section>|all}
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DOC500K = "/tmp/sfsynthdoc100"
DOC5M = "/tmp/sfsynthdoc1000"

SECTIONS = {
    # VERDICT r11 #2: the aged-heap span-hash shuffle (pass 1 vs pass 0)
    "q263": (["q263_substring_dedup"], DOC5M, 3),
    # VERDICT r11 #3: re-profile post-shingle-rewrite
    "q52": (["q52_minhash_lsh"], DOC500K, 3),
    # VERDICT r11 #4: the ~1 us/gram CPython floor
    "q187": (["q187_winnowing"], DOC5M, 2),
    # collateral sanity rows for shared-operator changes
    "q225": (["q225_ppl_buckets"], DOC5M, 2),
    "q128": (["q128_containment_join"], DOC500K, 2),
}


_ENSURE = {
    DOC500K: ("doc", 100),
    DOC5M: ("doc", 1000),
}


def run_section(section: str) -> None:
    builders, sf_dir, passes = SECTIONS[section]
    from make_scale_data import ensure

    kind, factor = _ENSURE[sf_dir]
    ensure(sf_dir, kind, factor)
    from dicom_metadata_extractor_serverless_datalake_spark.queries.corpus import QUERIES
    from dicom_metadata_extractor_serverless_datalake_spark.session import get_spark

    spark = get_spark(app_name=f"bench_r12_{section}")
    for builder in builders:
        fn = QUERIES[builder].spark_fn
        walls = []
        for i in range(passes):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{builder} pass{i}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        print(
            f"RESULT {section} {builder}: passes={[f'{w:.1f}' for w in walls]}",
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
