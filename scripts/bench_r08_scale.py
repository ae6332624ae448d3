#!/usr/bin/env python3
"""Round-8 scale rows (BASELINE.md): run one SECTION per fresh JVM
(heap aging inflates repeated-section numbers — measurement-hygiene
rule), warm min-of-2 through the noop sink, timing INCLUDING query
construction (driver-action rounds — CC fixpoints, k-means centroid
collects — are part of the operator's cost).

Usage: python scripts/bench_r08_scale.py {doc100|doc1000|ev100|ev1000}
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SECTIONS = {
    "recheck244": ("/tmp/sfsynthdoc100", ["q244_incremental_neardup"], 2),
    "recheck247": ("/tmp/sfsynth10", ["q247_rfm_segments"], 2),
    "doc100q243": ("/tmp/sfsynthdoc100", ["q243_neardup_star", "q248_cluster_balanced_sample"], 2),
    "doc100b": ("/tmp/sfsynthdoc100", ["q262_countmin_audit"], 2),
    "doc100c": ("/tmp/sfsynthdoc100", ["q263_substring_dedup"], 2),
    "str8": ("/tmp/sfsynthdoc100", ["q266_stream_countmin"], 1),
    "mix8": ("/tmp/sfsynthdoc100", ["q265_rake_keywords"], 2),
    "rel8b": ("/tmp/sfsynth10", ["q267_seasonal_decompose"], 2),
    "rel8": ("/tmp/sfsynth10", ["q264_autocorrelation"], 2),
    "ev100d": ("/tmp/evsynth100", ["q270_cochran_armitage"], 2),
    "rel8c": ("/tmp/sfsynth10", ["q269_hits_bipartite"], 2),
    "ev100c": ("/tmp/evsynth100", ["q268_kruskal_wallis"], 2),
    "ev100b": ("/tmp/evsynth100", ["q260_association_rules", "q261_mcnemar_paired"], 2),
    "doc100": (
        "/tmp/sfsynthdoc100",
        [
            "q253_lsh_s_curve_sampled",
            "q254_diversity_sample_star",
            "q255_linkage_capped_blocks",
            "q256_good_turing",
            "q257_chi2_collocations",
            "q259_kmeans_embeddings",
        ],
        2,
    ),
    "doc1000": ("/tmp/sfsynthdoc1000", ["q254_diversity_sample_star"], 1),
    "ev100": ("/tmp/evsynth100", ["q258_mann_whitney"], 2),
    "ev1000": (
        "/tmp/evsynth1000",
        ["q241_stream_burstiness", "q171_stream_sequences"],
        1,
    ),
}


def main() -> None:
    section = sys.argv[1]
    sf_dir, names, passes = SECTIONS[section]
    from dicom_metadata_extractor_serverless_datalake_spark.queries.corpus import QUERIES
    from dicom_metadata_extractor_serverless_datalake_spark.session import get_spark

    spark = get_spark(app_name=f"bench_r08_{section}")
    for name in names:
        walls = []
        rows = None
        for _ in range(passes):
            spark.catalog.clearCache()
            t0 = time.time()
            df = QUERIES[name].spark_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
            if rows is None and passes >= 2:
                rows = df.count()  # cheap relative to the warm pass
        print(
            f"RESULT {section} {name}: wall={min(walls):.1f}s "
            f"(passes={[f'{w:.1f}' for w in walls]}) rows={rows}",
            flush=True,
        )


if __name__ == "__main__":
    main()
