#!/usr/bin/env python3
"""Experiment: q52's signature stage as one Arrow map pass.

Current form: posexplode to one row PER SHINGLE (48x inflation), JVM
md5 via the hex-string path (md5 -> substr -> conv), then a 16-min
partial aggregation + doc_id exchange back to one row per doc.
Variant: per-doc byte-slice grams + memoized C md5 (the q187/q53
technique) + one vectorized (16 x m) permutation-min — emits
(doc_id, m0..m15) directly: NO explode, NO aggregation exchange.

Semantics pinned: split on single space KEEPS empty words (unlike
q187's oracle); docs with < 3 words emit nothing; null text emits
nothing. Verifies exact q52 row equality at sf0.01 and the 500k
fingerprint, then measures both forms.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dicom_metadata_extractor_serverless_datalake_spark.queries.base import spread_input
from dicom_metadata_extractor_serverless_datalake_spark.queries.llm import (
    MERSENNE_P,
    N_BANDS,
    NUM_PERM,
    PERM_A,
    PERM_B,
    ROWS_PER_BAND,
    _minhash_band_pairs,
)
from dicom_metadata_extractor_serverless_datalake_spark.session import get_spark
from dicom_metadata_extractor_serverless_datalake_spark.sources.tables import load_table


def arrow_band_pairs(spark, d):
    docs = spread_input(load_table(spark, d, "documents"), key="doc_id")

    def sig_batches(it):
        import hashlib

        import numpy as np
        import pyarrow as pa

        md5 = hashlib.md5
        p = MERSENNE_P
        A = np.array(PERM_A, np.int64)[:, None]
        B = np.array(PERM_B, np.int64)[:, None]
        memo: dict = {}
        memo_get = memo.get

        for batch in it:
            ids = batch.column("doc_id").to_pylist()
            out_ids = []
            out_m = [[] for _ in range(NUM_PERM)]
            for doc_id, text in zip(ids, batch.column("text").to_pylist()):
                if text is None:
                    continue
                wbs = [w.encode() for w in text.split(" ")]  # empties KEPT
                m = len(wbs) - 2
                if m <= 0:
                    continue
                blob = b" ".join(wbs)
                starts: list = []
                ends: list = []
                sa = starts.append
                ea = ends.append
                pos = 0
                for b in wbs:
                    sa(pos)
                    pos += len(b)
                    ea(pos)
                    pos += 1
                hs_l: list = []
                ap = hs_l.append
                for s, e in zip(starts, ends[2:]):
                    g = blob[s:e]
                    v = memo_get(g)
                    if v is None:
                        v = int.from_bytes(md5(g).digest()[:4], "big") % p
                        if len(memo) > 2_000_000:
                            memo.clear()
                        memo[g] = v
                    ap(v)
                hs = np.array(hs_l, np.int64)
                mins = ((A * hs[None, :] + B) % p).min(axis=1)
                out_ids.append(doc_id)
                for i in range(NUM_PERM):
                    out_m[i].append(int(mins[i]))
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_ids, pa.int64())]
                + [pa.array(c, pa.int64()) for c in out_m],
                ["doc_id"] + [f"m{i}" for i in range(NUM_PERM)],
            )

    mh = docs.select("doc_id", "text").mapInArrow(
        sig_batches,
        "doc_id long, " + ", ".join(f"m{i} long" for i in range(NUM_PERM)),
    )
    sig_array = F.expr(
        "array("
        + ", ".join(
            "concat_ws('_', "
            + ", ".join(
                f"cast(m{b * ROWS_PER_BAND + r} as string)"
                for r in range(ROWS_PER_BAND)
            )
            + ")"
            for b in range(N_BANDS)
        )
        + ")"
    )
    bands = mh.select("doc_id", F.posexplode(sig_array).alias("band", "sig"))
    a = bands.alias("a")
    b = bands.alias("b")
    raw = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.sig") == F.col("b.sig"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
    return raw.repartitionByRange("d1", "d2").distinct().orderBy("d1", "d2")


def main() -> None:
    spark = get_spark(app_name="exp-q52-arrow-sig")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    D = "/tmp/sfsynthdoc100"

    sf = "/root/testdata/sf0.01"
    cur = [tuple(r) for r in _minhash_band_pairs(spark, sf, sorted_output=True).orderBy("d1", "d2").collect()]
    new = [tuple(r) for r in arrow_band_pairs(spark, sf).collect()]
    assert cur == new, (len(cur), len(new))
    print(f"sf0.01 exact equality OK ({len(cur)} rows)")

    def fp(df):
        return tuple(
            df.agg(
                F.count("*"), F.sum("d1"), F.sum("d2"), F.sum(F.col("d1") * F.col("d2") % 97)
            ).collect()[0]
        )

    f_new = fp(arrow_band_pairs(spark, D))
    print("fp new:", f_new)
    assert f_new == (27920422, 4632625354122, 9327018935121, 1326253456)
    print("500k fingerprint MATCH")

    for name, fn in (
        ("arrow", lambda: arrow_band_pairs(spark, D)),
        ("current", lambda: _minhash_band_pairs(spark, D, sorted_output=True).orderBy("d1", "d2")),
    ):
        walls = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"q52-{name}-{i}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 2))
        print("RESULT", name, walls)


if __name__ == "__main__":
    main()
