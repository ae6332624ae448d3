"""Custom operators Spark lacks natively, built as compositions of
DataFrame ops (SURVEY §2.B 'custom operators' guidance): as-of join,
skew-mitigation (salted join/agg), IVF approximate nearest-neighbor
search. The dedup family (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding-cosine), text analysis, and multimodal plumbing
live in queries/llm.py and functions/multimodal.py."""

from .ann import assign_buckets, fit_ivf, ivf_search  # noqa: F401
from .asof import asof_join  # noqa: F401
from .dedup import (  # noqa: F401
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_signatures,
    neardup_pairs,
    shingle_tokens,
)
from .skew import salted_agg_count, salted_join  # noqa: F401
from .cluster import connected_components, dedup_clusters  # noqa: F401
from .compact import compact_lake, compact_partition, partition_file_stats  # noqa: F401
from .purge import purge_rows, purge_unpartitioned  # noqa: F401
from .rank import global_positions  # noqa: F401
