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
# registered query has a green driver row (cumulative 270/270 as of
# CORRECTNESS_r08), so the window is a staleness rotation: the 10
# queries registered this round (never driver-verified) first, then
# the 40 stalest greens — all 21 round-3-vintage rows plus the 19
# lowest-numbered round-4 rows (VERDICT r08 task #2's front-load; the
# remaining 30 round-4 rows go first in r10) — exactly 50. After each
# new CORRECTNESS artifact lands, rotate its greens to the back and
# front-load whatever is newest/stalest.
_PRIORITY = [
    # new this round — never driver-verified
    "q271_average_precision",
    "q272_ams_f2",
    "q273_levene_spread",
    "q274_friedman_test",
    "q275_scene_cuts",
    "q276_fk_integrity",
    "q277_simpson_diversity",
    "q278_vocab_growth",
    "q279_fisher_scores",
    "q280_stream_ams",
    # stalest greens: the full round-3 band (21 queries)
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
    # then the 19 lowest-numbered round-4 rows
    "q34_running_sum",
    "q35_range_frame",
    "q36_tumbling_window",
    "q37_sliding_window",
    "q38_session_window",
    "q39_asof_join",
    "q40_string_funcs",
    "q41_regexp",
    "q42_date_funcs",
    "q43_conditional",
    "q44_null_funcs",
    "q46_array_funcs",
    "q47_struct_map",
    "q48_binary_funcs",
    "q52_minhash_lsh",
    "q64_quantiles",
    "q67_ann_ivf",
    "q84_stream_dedup",
    "q99_stream_stateful_totals",
    # ^ exactly 50 = the driver window (10 new this round + 40 stalest).
    # The 30 remaining round-4-vintage greens, front of the r10 window:
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
    # the r05-r08 windows hold the freshest driver rows and rotate
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
