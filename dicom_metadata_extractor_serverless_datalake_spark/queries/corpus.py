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

# Registration-order priority. External harnesses sample queries() from
# the FRONT of the registry (dict insertion order), so the queries whose
# driver-oracle verification is least established go first: the LLM/
# multimodal/UDF/training families plus the queries whose oracles were
# reworked this round (q14/q45/q69 exact+bound-boolean pattern, q53
# banding, ANN recall checks). Everything already verified green in
# round 1 follows in its natural family order.
_PRIORITY = [
    # dedup / similarity / text / clustering / quantization
    "q49_distinct_math",
    "q50_dedup_exact",
    "q51_jaccard_pairs",
    "q52_minhash_lsh",
    "q53_simhash",
    "q54_cosine_topk",
    "q67_ann_ivf",
    "q55_ann_lsh",
    "q68_neardup_pipeline",
    "q60_embedding_neardup",
    "q56_text_stats",
    "q57_language_id",
    "q58_fingerprint",
    "q59_token_count",
    "q70_levenshtein_pairs",
    "q77_dedup_clusters",
    "q78_embedding_quantization",
    # multimodal
    "q61_image_features",
    "q62_frame_sample",
    "q63_modality_rollup",
    # pandas-UDF surface
    "q65_grouped_map_pandas",
    "q66_grouped_agg_pandas",
    # training prep
    "q71_train_split",
    "q72_stratified_sample",
    "q73_doc_chunking",
    "q74_pii_redaction",
    "q75_vocab_topk",
    "q76_epoch_shuffle",
    "q79_filter_funnel",
    "q80_boilerplate_ngrams",
    "q81_skew_report",
    "q82_decontamination",
    # streaming-executed twins (availableNow micro-batch execution)
    "q83_stream_tumbling",
    "q84_stream_dedup",
    "q85_stream_upsert_snapshot",
    # oracles reworked this round
    "q14_approx_count_distinct",
    "q45_json",
    "q69_approx_percentile",
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
