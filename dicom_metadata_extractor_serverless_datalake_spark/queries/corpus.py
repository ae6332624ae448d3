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

# Registration-order priority. External harnesses sample queries() from
# the FRONT of the registry (dict insertion order), so the queries whose
# driver-oracle verification is least established go first. Round-3
# window (50 entries): the two streaming queries that failed round 2 on
# the TIMESTAMP_NTZ testdata regeneration (fixed in sources/tables.py),
# the 13 new analytics queries (q86-q98), then the 35 queries that fell
# outside round 2's 50-query window (all green in round 1). Everything
# with a green round-2 row follows in family order.
_PRIORITY = [
    # streaming-executed twins that errored in round 2 (NTZ event time)
    "q83_stream_tumbling",
    "q84_stream_dedup",
    # new round-3 analytics family
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
    # new round-3 streaming-executed queries (stateful + session state)
    "q99_stream_stateful_totals",
    "q100_stream_session_window",
    # new round-3 join/sketch/variant queries
    "q101_time_proximity_join",
    "q102_rolling_distinct_sketch",
    "q103_variant_json",
    "q104_prefix_filter_join",
    "q105_event_transitions",
    "q106_data_quality_audit",
    "q107_kll_quantile_rollup",
    "q108_theta_set_algebra",
    "q109_stream_interval_join",
    "q110_stream_static_enrich",
    "q111_audio_features",
    "q112_multimodal_neardup",
    "q113_udtf_lateral",
    # green in round 1 but outside round 2's window
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
    "q35_range_frame",
    "q36_tumbling_window",
    "q37_sliding_window",
    "q38_session_window",
    "q39_asof_join",
    # q34/q40-q44/q46-q48/q64 (all green in round 1) yield their window
    # slots to q99-q110, which have no driver row yet; they register
    # right after the window
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
