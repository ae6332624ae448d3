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

# Registration-order priority. External harnesses sample queries() from
# the FRONT of the registry (dict insertion order), so the queries whose
# driver-oracle verification is least established go first. Round-4
# window (50 entries): first the 15 queries whose only driver row dates
# from round 1 (the corpus-wide TIMESTAMP_NTZ normalization landed since
# and touches the events.ts column q34-q38 read), then the queries whose
# implementation changed this round (q67 IVF broadcast assignment, q104
# shared token derivation, q84/q99 multi-micro-batch execution, and the
# new q114 sketch-mode robust z-score), then the least-recently-verified
# round-2 greens (LLM/dedup/training family). The remaining round-2
# greens (relational q01-q12 and friends — stable, pytest-mirrored)
# rotate into round 5's window.
_PRIORITY = [
    # driver-green only in round 1 — re-verify on current corpus
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
    "q64_quantiles",
    # implementation changed in round 4 — re-verify even if green r03
    "q67_ann_ivf",
    "q104_prefix_filter_join",
    "q84_stream_dedup",
    "q99_stream_stateful_totals",
    "q114_robust_zscore_sketch",
    "q115_stats_broadcast_join",
    # new in round 4 — no driver row yet
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
    # round-4b mining/IR additions — NEVER driver-verified, so they
    # outrank re-verification of the r02-green LLM family for the
    # remaining window slots (all are locally oracle-EXACT at
    # sf0.001/0.01/0.1)
    "q132_countmin_freq",
    "q133_dimension_colsim",
    "q134_sorted_neighborhood",
    "q135_inverted_index",
    "q136_tv_drift",
    "q137_rrf_hybrid",
    "q138_winsorized_stats",
    "q139_bloom_decontaminate",
    "q140_seasonal_anomaly",
    "q141_join_size_sketch",
    "q142_frequent_pairs",
    "q143_stream_tv_drift",
    # one flagship LLM representative keeps a fresh row
    "q52_minhash_lsh",
    # ^ exactly 50 entries (the driver window). The round-4c curation
    # family lands just past the window boundary: never driver-
    # verified, locally oracle-exact, first in line for round 5.
    "q144_ngram_decontaminate",
    "q145_intradoc_repetition",
    "q146_semantic_dedup",
    "q147_recursive_cte",
    # round-4d retrieval & signals family (queries/signals.py)
    "q148_bm25_topk",
    "q149_kcore",
    "q150_gopher_rules",
    "q151_ewma_anomaly",
    "q152_interval_overlap",
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
    "q163_stream_ewma",
    "q164_stream_late_drop",
    "q165_auc_exact",
    # round-4f model-prep family (queries/prep.py)
    "q166_knn_label_audit",
    "q167_feature_hashing",
    "q168_event_sequences",
    "q169_group_reservoir",
    "q170_negative_sampling",
    "q171_stream_sequences",
    "q172_class_prototypes",
    "q173_class_outliers",
    "q174_timeseries_cv",
    "q175_centroid_confusion",
    "q176_target_encoding",
    "q177_stream_funnel",
    # The rest of the LLM family (q50, q51,
    # q53-q62, last green r02) plus q63-q82/q85/q45/q49/q14, q01-q12,
    # and the r03-green analytics/streaming families follow and rotate
    # into round 5's window.
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
    "q45_json",
    "q49_distinct_math",
    "q14_approx_count_distinct",
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
