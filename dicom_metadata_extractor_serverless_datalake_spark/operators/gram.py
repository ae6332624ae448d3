"""Exact gram matrix (A^T A) of an embedding column — all-pairs
DIMENSION similarity of a tall-skinny matrix, computed map-side.

The naive DataFrame form explodes every row into d*(d+1)/2 product
terms and shuffles them (a 2080x row blowup at d=64). This operator
instead accumulates the d x d partial gram INSIDE each partition with
vectorized numpy (the DIMSUM/A^T A pattern from Zadeh & Carlsson,
"Dimension Independent Matrix Square using MapReduce", without the
sampling — exactness matters more than the constant here), then ships
only d*(d+1)/2 integer cells per partition to a final sum. Shuffle
volume is independent of the row count: ~2080 longs per task at d=64,
whatever N is — the shape that survives 100 TB of embeddings.

Exactness / determinism: float sums are not reduction-order-stable, so
each per-row product (computed in float64, IEEE-exact) is floored to a
fixed-point grid (``floor(x_i * x_j * 10**scale)``) and summed as
int64 — associative, bit-identical under any partitioning, and exactly
reproducible by an engine-independent oracle applying the same floor.
Envelope: |x| <= 100 and scale=6 keep each term < 10^10, so int64
holds ~9e8 rows/partition pre-merge and decimal(38) holds the global
sum at any realistic N.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_partition(col: str, dim: int, scale: int):
    iu = np.triu_indices(dim)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((dim, dim), dtype=np.int64)
        mul = float(10**scale)
        for pdf in batches:
            x = np.asarray(list(pdf[col]), dtype=np.float64)
            if x.size == 0:
                continue
            # chunk so the n x d x d product tensor stays ~16 MB
            step = max(1, (1 << 21) // (dim * dim))
            for lo in range(0, x.shape[0], step):
                c = x[lo : lo + step]
                prod = np.einsum("ni,nj->nij", c, c)
                acc += np.floor(prod * mul).astype(np.int64).sum(axis=0)
        yield pd.DataFrame(
            {"i": iu[0].astype(np.int64), "j": iu[1].astype(np.int64),
             "s": acc[iu]}
        )

    return run


def gram_matrix(df: DataFrame, col: str, dim: int, scale: int = 6) -> DataFrame:
    """Upper-triangle exact scaled gram: (i, j, s) with i <= j and
    ``s = sum_rows floor(x_i * x_j * 10**scale)`` as decimal(38,0)."""
    parts = df.select(col).mapInPandas(
        _gram_partition(col, dim, scale), schema="i long, j long, s long"
    )
    return parts.groupBy("i", "j").agg(
        F.sum(F.col("s").cast("decimal(38,0)")).alias("s")
    )
