#!/usr/bin/env python3
"""Round-11 scale rows (BASELINE.md): one SECTION per fresh JVM (heap
aging inflates repeated-section numbers), cache-clean between passes,
timing INCLUDING query construction, through the noop sink — the
bench_r09/r10_scale.py discipline unchanged.

Covers the round's new queries q291-q300 at 100x their test scale,
10x stress rows for the event-calendar statistics (100M events) and
the corpus-scan queries (5M docs), plus the embeddings family at 200k
vectors. q300 is the streaming tokenizer: its wall includes staging
the stream source, the batch merge training, a 3-micro-batch drain
and the rollup — the full operational path, 1 pass (checkpoint dirs
are not reusable across passes).

Usage: python scripts/bench_r11_scale.py {<section>|all} — see SECTIONS
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DOC500K = "/tmp/sfsynthdoc100"
DOC5M = "/tmp/sfsynthdoc1000"
EV10M = "/tmp/evsynth100"
EV100M = "/tmp/evsynth1000"

SECTIONS = {
    # round-11 new-query 100x scale rows
    "newdoc": (
        ["q291_bpe_encode", "q294_tost_equivalence", "q298_readability"],
        DOC500K,
        2,
    ),
    "newev": (
        ["q292_page_trend", "q293_cliff_delta", "q295_pettitt_changepoint",
         "q296_durbin_watson"],
        EV10M,
        2,
    ),
    # embeddings tables ride in the doc dirs: 200k vectors at DOC500K
    "newemb": (["q297_silhouette_audit", "q299_mmd_drift"], DOC500K, 2),
    "str11": (["q300_stream_tokenize"], DOC500K, 1),
    # 10x stress for the calendar/value-domain arithmetic
    "ev100m": (
        ["q292_page_trend", "q293_cliff_delta", "q295_pettitt_changepoint",
         "q296_durbin_watson"],
        EV100M,
        1,
    ),
    "doc5m": (["q291_bpe_encode", "q298_readability"], DOC5M, 1),
}


_ENSURE = {
    DOC500K: ("doc", 100),
    DOC5M: ("doc", 1000),
    EV10M: ("events", 100),
    EV100M: ("events", 1000),
}


def run_section(section: str) -> None:
    builders, sf_dir, passes = SECTIONS[section]
    from make_scale_data import ensure

    kind, factor = _ENSURE[sf_dir]
    ensure(sf_dir, kind, factor)
    from dicom_metadata_extractor_serverless_datalake_spark.queries.corpus import QUERIES
    from dicom_metadata_extractor_serverless_datalake_spark.session import get_spark

    spark = get_spark(app_name=f"bench_r11_{section}")
    for builder in builders:
        fn = QUERIES[builder].spark_fn
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
            f"RESULT {section} {builder}: wall={min(walls):.1f}s "
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
