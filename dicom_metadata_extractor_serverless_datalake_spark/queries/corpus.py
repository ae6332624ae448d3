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
# registered query has a green driver row (cumulative 252/252 as of
# CORRECTNESS_r07), so the window is a staleness rotation: the 18
# queries registered this round (never driver-verified) first, then
# the 32 stalest greens (last driver rows rounds 2-3) — exactly 50.
# After each new CORRECTNESS artifact lands, rotate its greens to the
# back and front-load whatever is newest/stalest.
_PRIORITY = [
    # new this round — never driver-verified
    "q253_lsh_s_curve_sampled",
    "q254_diversity_sample_star",
    "q255_linkage_capped_blocks",
    "q256_good_turing",
    "q257_chi2_collocations",
    "q258_mann_whitney",
    "q259_kmeans_embeddings",
    "q260_association_rules",
    "q261_mcnemar_paired",
    "q262_countmin_audit",
    "q263_substring_dedup",
    "q264_autocorrelation",
    "q265_rake_keywords",
    "q266_stream_countmin",
    "q267_seasonal_decompose",
    "q268_kruskal_wallis",
    "q269_hits_bipartite",
    "q270_cochran_armitage",
    # stalest greens: last driver row rounds 2-3 (the q78-q102 band
    # VERDICT r07 task 6 named)
    "q78_embedding_quantization",
    "q79_filter_funnel",
    "q80_boilerplate_ngrams",
    "q81_skew_report",
    "q82_decontamination",
    "q85_stream_upsert_snapshot",
    "q13_count_distinct",
    "q15_rollup",
    "q16_cube",
    "q17_grouping_sets",
    "q18_collect_sorted",
    "q19_union_all",
    "q20_intersect",
    "q21_except",
    "q22_top_k",
    "q23_scalar_subquery",
    "q24_groupwise_compare",
    "q25_exists_subquery",
    "q26_not_exists",
    "q27_pivot",
    "q28_unpivot",
    "q29_latest_per_key",
    "q30_ranking",
    "q31_top_n_per_group",
    "q32_percentiles",
    "q33_lag_lead",
    "q83_stream_tumbling",
    "q86_cohort_retention",
    "q87_funnel_steps",
    "q88_sessionize_lag",
    "q89_gapfill_daily",
    "q90_hll_partitioned_union",
    # ^ exactly 50 = the driver window (18 new this round + the 32
    # stalest round-2/3 greens).
    "q91_weighted_sample",
    "q92_robust_zscore",
    "q93_price_histogram",
    "q94_regression_exact",
    "q95_tfidf_topterms",
    "q96_mode_median",
    "q97_decile_stats",
    "q98_pareto_frontier",
    "q100_stream_session_window",
    "q101_time_proximity_join",
    "q102_rolling_distinct_sketch",
    "q103_variant_json",
    "q105_event_transitions",
    "q106_data_quality_audit",
    "q107_kll_quantile_rollup",
    "q108_theta_set_algebra",
    "q109_stream_interval_join",
    "q110_stream_static_enrich",
    "q111_audio_features",
    "q112_multimodal_neardup",
    "q113_udtf_lateral",
    "q01_pricing_summary",
    # the r07 window (q242-q252 + the q02-q77 band) holds the freshest
    # driver rows and rotates behind; everything unlisted follows in
    # registration order via _apply_priority
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
