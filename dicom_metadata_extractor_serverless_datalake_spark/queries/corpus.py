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
# driver-oracle verification is least established go first. The last
# delivered driver artifact is CORRECTNESS_r05 (50/50 green: q135 +
# q144-q192), leaving q193-q241 (49) as the only never-driver-verified
# set. Current window: all 49 of those, plus the single stalest green
# (q01, last driver row round 1) to fill the 50-entry window. After
# each new CORRECTNESS artifact lands, rotate its greens out of the
# front and front-load whatever is still unverified.
_PRIORITY = [
    # round-6 statistics/drift family — never driver-verified
    "q193_hellinger_drift",
    "q194_dup_span_coverage",
    "q195_winnow_match",
    "q196_cusum_changepoint",
    "q197_theil_sen",
    "q198_anova_f",
    "q199_ks_test",
    "q200_stream_cusum",
    "q201_bigram_lm_score",
    "q202_sequence_packing",
    "q203_dsir_importance",
    "q204_temperature_mix",
    "q205_token_budget_curriculum",
    "q206_mann_whitney",
    "q207_markov_transitions",
    "q208_touch_attribution",
    "q209_kaplan_meier",
    "q210_gini_concentration",
    "q211_stream_attribution",
    "q212_holt_trend",
    "q213_dow_seasonality",
    "q214_k_anonymity",
    "q215_l_diversity",
    "q216_matryoshka_audit",
    "q217_brier_decomposition",
    "q218_cumulative_gains",
    "q219_conformal_coverage",
    "q220_minhash_calibration",
    "q221_t_closeness",
    # round-7 additions — no driver row yet
    "q222_sequence_completeness",
    "q223_hard_negatives",
    "q224_quality_classifier",
    "q225_ppl_buckets",
    "q226_welch_ttest",
    "q227_kendall_tau",
    "q228_ngram_novelty",
    "q229_length_buckets",
    "q230_stream_completeness",
    "q231_stream_ab_monitor",
    "q232_lang_kappa",
    "q233_wilson_ci",
    "q234_jackknife_se",
    "q235_assortativity",
    "q236_source_modularity",
    "q237_adjusted_rand",
    "q238_time_to_convert",
    "q239_burstiness",
    "q240_blocking_recall",
    "q241_stream_burstiness",
    # ^ 49 never-verified + q01 below = exactly 50 (the driver window).
    # Below: stalest greens (relational core, last driver row round
    # 1/2), then next-stalest (r02 LLM/training, r03 analytics/windows/
    # set-ops); the r05-green families (q135, q144-q192) rotate to the
    # very back.
    "q01_pricing_summary",
    "q02_filter_project",
    "q03_join_broadcast_agg",
    "q04_star_join",
    "q05_left_join",
    "q06_right_join",
    "q07_full_outer_join",
    "q08_semi_join",
    "q09_anti_join",
    "q10_cross_join",
    "q11_range_join",
    "q12_agg_stats",
    "q13_count_distinct",
    "q18_collect_sorted",
    "q50_dedup_exact",
    "q51_jaccard_pairs",
    "q53_simhash",
    "q54_cosine_topk",
    "q55_ann_lsh",
    "q56_text_stats",
    "q57_language_id",
    "q58_fingerprint",
    "q59_token_count",
    "q60_embedding_neardup",
    "q61_image_features",
    "q62_frame_sample",
    "q63_modality_rollup",
    "q65_grouped_map_pandas",
    "q66_grouped_agg_pandas",
    "q68_neardup_pipeline",
    "q69_approx_percentile",
    "q70_levenshtein_pairs",
    "q71_train_split",
    "q72_stratified_sample",
    "q73_doc_chunking",
    "q74_pii_redaction",
    "q75_vocab_topk",
    "q76_epoch_shuffle",
    "q77_dedup_clusters",
    "q78_embedding_quantization",
    "q79_filter_funnel",
    "q80_boilerplate_ngrams",
    "q81_skew_report",
    "q82_decontamination",
    "q85_stream_upsert_snapshot",
    "q29_latest_per_key",
    "q45_json",
    "q49_distinct_math",
    "q14_approx_count_distinct",
    "q15_rollup",
    "q16_cube",
    "q17_grouping_sets",
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
    "q30_ranking",
    "q31_top_n_per_group",
    "q32_percentiles",
    "q33_lag_lead",
    "q111_audio_features",
    "q112_multimodal_neardup",
    "q113_udtf_lateral",
    "q83_stream_tumbling",
    "q100_stream_session_window",
    "q109_stream_interval_join",
    "q110_stream_static_enrich",
    "q86_cohort_retention",
    "q87_funnel_steps",
    "q88_sessionize_lag",
    "q89_gapfill_daily",
    "q90_hll_partitioned_union",
    "q91_weighted_sample",
    "q92_robust_zscore",
    "q93_price_histogram",
    "q94_regression_exact",
    "q95_tfidf_topterms",
    "q96_mode_median",
    "q97_decile_stats",
    "q98_pareto_frontier",
    "q101_time_proximity_join",
    "q102_rolling_distinct_sketch",
    "q103_variant_json",
    "q105_event_transitions",
    "q106_data_quality_audit",
    "q107_kll_quantile_rollup",
    "q108_theta_set_algebra",
    # round-4-green window (freshest driver rows) — rotate to the back;
    # anything unlisted follows in registration order via _apply_priority
]


def _apply_priority() -> None:
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update((n, q) for n, q in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_priority()


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark_fn for name, q in QUERIES.items()}


def get_oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle}


def headline_queries() -> dict[str, Query]:
    return {name: q for name, q in QUERIES.items() if q.headline}
