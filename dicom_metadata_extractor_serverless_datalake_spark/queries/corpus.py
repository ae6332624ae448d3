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
# registered query has a green driver row (cumulative 290/290 as of
# CORRECTNESS_r10), so the window is a staleness rotation: the 10
# queries registered this round (never driver-verified) first, then
# the 40 stalest greens — the full remaining round-5-vintage band
# q153–q192 (VERDICT r10 task #1's front-load) — exactly 50. After
# each new CORRECTNESS artifact lands, rotate its greens to the back
# and front-load whatever is newest/stalest (next up: the round-6
# window). tests/test_corpus.py's freshness guard derives the stalest
# set from the CORRECTNESS_r*.json artifacts and fails if this list's
# front window drifts from it (VERDICT r10 task #4).
_PRIORITY = [
    # new this round — never driver-verified
    "q291_bpe_encode",
    "q292_page_trend",
    "q293_cliff_delta",
    "q294_tost_equivalence",
    "q295_pettitt_changepoint",
    "q296_durbin_watson",
    "q297_silhouette_audit",
    "q298_readability",
    "q299_mmd_drift",
    "q300_stream_tokenize",
    # stalest greens: the remaining round-5-vintage band (40 queries,
    # last driver-verified in CORRECTNESS_r05)
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
    "q178_stream_lsh_dedup",
    "q179_source_overlap",
    "q180_split_leakage",
    "q181_dedup_yield",
    "q182_calibration_ece",
    "q183_stratified_split",
    "q184_ndcg_exact",
    "q185_stream_reservoir",
    "q186_spearman_exact",
    "q187_winnowing",
    "q188_chisq_independence",
    "q189_autocorrelation",
    "q190_link_prediction",
    "q191_benford_audit",
    "q192_quantile_norm",
    # ^ exactly 50 = the driver window (10 new + 40 stalest).
    # The r10 window (q281-q290 + the r04 band + 10 low-r05 rows) and
    # the r06-r09 windows hold the freshest driver rows and rotate
    # behind; everything unlisted follows in registration order via
    # _apply_priority.
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
