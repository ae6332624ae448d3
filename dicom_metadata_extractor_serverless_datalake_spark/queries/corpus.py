"""Corpus aggregator: importing this module registers every query family.

Driver contract (``__spark_entry__.py``) pulls ``get_queries()`` /
``get_oracles()`` from here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .base import QUERIES, Query

# side-effect imports: each module registers its queries
from . import relational  # noqa: F401,E402
from . import windows  # noqa: F401,E402
from . import scalar  # noqa: F401,E402
from . import llm  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from . import udfs  # noqa: F401,E402
from . import training  # noqa: F401,E402
from . import streams  # noqa: F401,E402
from . import analytics  # noqa: F401,E402
from . import mining  # noqa: F401,E402
from . import curation  # noqa: F401,E402
from . import signals  # noqa: F401,E402
from . import prep  # noqa: F401,E402
from . import quality  # noqa: F401,E402
from . import mixture  # noqa: F401,E402
from . import behavior  # noqa: F401,E402
from . import privacy  # noqa: F401,E402
from . import evals  # noqa: F401,E402
from . import audits  # noqa: F401,E402
from . import inference  # noqa: F401,E402
from . import selection  # noqa: F401,E402

# Registration-order priority. External harnesses sample queries() from
# the FRONT of the registry (dict insertion order), so the queries whose
# driver-oracle verification is least established go first. Every
# registered query has a green driver row (cumulative 280/280 as of
# CORRECTNESS_r09), so the window is a staleness rotation: the 10
# queries registered this round (never driver-verified) first, then
# the 40 stalest greens — the full round-4-vintage band (30 queries,
# VERDICT r09 task #1's front-load) plus the 10 lowest-numbered
# round-5 rows — exactly 50. After each new CORRECTNESS artifact
# lands, rotate its greens to the back and front-load whatever is
# newest/stalest (next up: the remaining 40 round-5-vintage rows,
# q153-q192 minus the 10 taken here).
_PRIORITY = [
    # new this round — never driver-verified
    "q281_bootstrap_ci",
    "q282_jonckheere_trend",
    "q283_mann_kendall",
    "q284_runs_test",
    "q285_cramer_von_mises",
    "q286_chao1_richness",
    "q287_corr_matrix",
    "q288_jl_distortion",
    "q289_silence_runs",
    "q290_stream_bootstrap",
    # stalest greens: the full round-4-vintage band (30 queries)
    "q104_prefix_filter_join",
    "q114_robust_zscore_sketch",
    "q115_stats_broadcast_join",
    "q116_bigram_lm_score",
    "q117_domain_mixture",
    "q118_sequence_packing",
    "q119_incremental_rollup",
    "q120_triangle_count",
    "q121_pagerank_invariants",
    "q122_heavy_hitters",
    "q123_scd2_merge",
    "q124_data_skipping",
    "q125_collocation_lift",
    "q126_attribution",
    "q127_survivorship",
    "q128_containment_join",
    "q129_stream_heavy_hitters",
    "q130_zorder_skipping",
    "q131_ann_pq",
    "q132_countmin_freq",
    "q133_dimension_colsim",
    "q134_sorted_neighborhood",
    "q136_tv_drift",
    "q137_rrf_hybrid",
    "q138_winsorized_stats",
    "q139_bloom_decontaminate",
    "q140_seasonal_anomaly",
    "q141_join_size_sketch",
    "q142_frequent_pairs",
    "q143_stream_tv_drift",
    # then the 10 lowest-numbered round-5-vintage rows
    "q135_inverted_index",
    "q144_ngram_decontaminate",
    "q145_intradoc_repetition",
    "q146_semantic_dedup",
    "q147_recursive_cte",
    "q148_bm25_topk",
    "q149_kcore",
    "q150_gopher_rules",
    "q151_ewma_anomaly",
    "q152_interval_overlap",
    # ^ exactly 50 = the driver window (10 new + 40 stalest).
    # The remaining 40 round-5-vintage greens, front of the r11 window:
    "q153_twap",
    "q154_table_diff",
    "q155_consistent_sample",
    "q156_bpe_merges",
    "q157_best_split",
    "q158_ab_test",
    "q159_pit_join",
    "q160_kmeans_fixpoint",
    "q161_dynamic_partition_pruning",
    "q162_pca_top_eigen",
    # (q163-q192 follow in registration order via _apply_priority)
    # the r06-r09 windows hold the freshest driver rows and rotate
    # behind; everything unlisted follows in registration order via
    # _apply_priority
]


def _apply_priority() -> None:
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update((n, q) for n, q in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_priority()


def _cache_local(fn: Callable[[SparkSession, str], DataFrame]):
    """Queries that persist() intermediates cannot unpersist them before
    the caller's action runs, so in a long-lived session cached
    partitions would accumulate and CacheManager plan substitution
    could rewrite LATER queries' plans (ADVICE r07; the class of bug
    scripts/plan_audit.py works around the same way). Dropping the
    accumulated cache at query CONSTRUCTION keeps caching query-local
    for every harness that goes through ``queries()`` — the driver's
    correctness gate and oracle_sweep — without touching bench.py's
    warm-timing path (which calls ``Query.spark_fn`` directly)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.catalog.clearCache()
        return fn(spark, sf_dir)

    return run


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _cache_local(q.spark_fn) for name, q in QUERIES.items()}


def get_oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle}


def headline_queries() -> dict[str, Query]:
    return {name: q for name, q in QUERIES.items() if q.headline}
