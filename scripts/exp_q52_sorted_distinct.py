#!/usr/bin/env python3
"""Experiment (round 12, session 2): q52's tail is `.distinct()` (hash
exchange over ~28M pairs) followed by `.orderBy(d1, d2)` (range
exchange over the same rows) — two wide shuffles of the result set.
A single repartitionByRange(d1, d2) satisfies BOTH the distinct's
ClusteredDistribution and the sort's OrderedDistribution (guide §2.4:
two operations keyed the same way share one exchange), so the variant
plans ONE wide exchange + in-stage dedup + in-partition sort.

Measures both forms at 500k docs (fresh-ish session, noop sink,
3 warm passes) and verifies exact result equality at sf0.01.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dicom_metadata_extractor_serverless_datalake_spark.queries.llm import (
    _minhash_band_pairs,
)
from dicom_metadata_extractor_serverless_datalake_spark.session import get_spark

DOC_DIR = "/tmp/sfsynthdoc100"
VARIANT = os.environ.get("VARIANT", "both")


def current(spark, d):
    return _minhash_band_pairs(spark, d).orderBy("d1", "d2")


def sorted_distinct(spark, d):
    # rebuild the pre-distinct join from the helper's internals by
    # stripping the trailing Deduplicate via the logical plan is not
    # possible from the public API; instead re-run the helper minus its
    # .distinct() by monkey-free reimplementation: range-partition the
    # raw pair stream, dedup in place, sort in place.
    from dicom_metadata_extractor_serverless_datalake_spark.queries.base import spread_input
    from dicom_metadata_extractor_serverless_datalake_spark.queries.llm import (
        MERSENNE_P,
        N_BANDS,
        NUM_PERM,
        PERM_A,
        PERM_B,
        ROWS_PER_BAND,
    )
    from dicom_metadata_extractor_serverless_datalake_spark.queries.llm import (
        spark_h31,
    )
    from dicom_metadata_extractor_serverless_datalake_spark.sources.tables import load_table

    docs = spread_input(load_table(spark, d, "documents"), key="doc_id")
    tok = (
        docs.select("doc_id", F.split("text", " ").alias("_wg_w"))
        .select("doc_id", "_wg_w", F.posexplode("_wg_w").alias("_wg_i", "_wg_w0"))
        .filter(F.col("_wg_i") < F.size("_wg_w") - 2)
        .select(
            "doc_id",
            F.expr(
                "concat_ws(' ', _wg_w[_wg_i], _wg_w[_wg_i + 1], _wg_w[_wg_i + 2])"
            ).alias("s"),
        )
    )
    h = tok.select("doc_id", F.expr(spark_h31("s")).alias("hs"))
    mh = h.groupBy("doc_id").agg(
        *[
            F.min((F.lit(PERM_A[i]) * F.col("hs") + F.lit(PERM_B[i])) % MERSENNE_P).alias(f"m{i}")
            for i in range(NUM_PERM)
        ]
    )
    sig_array = F.array(
        *[
            F.concat_ws(
                "_",
                *[F.col(f"m{b * ROWS_PER_BAND + r}").cast("string") for r in range(ROWS_PER_BAND)],
            )
            for b in range(N_BANDS)
        ]
    )
    bands = mh.select("doc_id", F.posexplode(sig_array).alias("band", "sig"))
    a = bands.alias("a")
    b = bands.alias("b")
    raw = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
    )
    return raw.repartitionByRange("d1", "d2").distinct().orderBy("d1", "d2")


def main() -> None:
    spark = get_spark(app_name="exp-q52-sorted-distinct")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # ---- correctness at sf0.01 (exact ordered-rows equality) ----
    sf = "/root/testdata/sf0.01"
    cur_rows = current(spark, sf).collect()
    new_rows = sorted_distinct(spark, sf).collect()
    assert [tuple(r) for r in cur_rows] == [tuple(r) for r in new_rows], (
        len(cur_rows),
        len(new_rows),
    )
    print(f"sf0.01 equality OK ({len(cur_rows)} rows)")

    # ---- fingerprints at 500k (count + keyed sums) ----
    def fp(df):
        return df.agg(
            F.count("*"), F.sum("d1"), F.sum("d2"), F.sum(F.col("d1") * F.col("d2") % 97)
        ).collect()[0]

    f_cur = fp(current(spark, DOC_DIR))
    f_new = fp(sorted_distinct(spark, DOC_DIR))
    print("fp cur:", tuple(f_cur))
    print("fp new:", tuple(f_new))
    assert tuple(f_cur) == tuple(f_new)

    # ---- pre-distinct volume (how many duplicate pair rows the single
    # exchange would carry vs the two-exchange form) ----
    # (raw join output count)
    # reuse sorted_distinct's raw by rebuilding quickly
    # ---- walls ----
    for label, fn in (("current", current), ("sorted_distinct", sorted_distinct)):
        if VARIANT not in ("both", label):
            continue
        walls = []
        for i in range(4):
            spark.sparkContext.setJobDescription(f"q52-{label}-pass{i}")
            t0 = time.perf_counter()
            fn(spark, DOC_DIR).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 2))
        print(label, walls)

    print("\n==== sorted_distinct plan (tail) ====")
    sorted_distinct(spark, DOC_DIR).explain("formatted")


if __name__ == "__main__":
    main()
