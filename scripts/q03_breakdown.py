#!/usr/bin/env python3
"""Per-stage decomposition of q03 (orders ⋈ broadcast(customer) →
segment aggregate) at the 600M crossover scale — the evidence row for
the one headline query that sits above 2x DuckDB (BENCH_r06: 2.56x,
band 1.98-2.70, absolute ~1.4-1.5 s vs ~0.6 s).

Cumulative variants, each adding one plan stage, Spark and DuckDB
interleaved per pass (the bench._measure_both discipline) so both
engines sample the same ambient-noise windows; pass 0 cold discarded,
min over the rest:

    sched       trivial 1-row job            (per-job scheduling floor)
    scan        SUM(o_custkey), SUM(o_totalprice) over orders
                (columnar scan + decode of exactly q03's columns)
    join        + broadcast customer, probe, SUM(o_totalprice)
    group_str   + groupBy(c_mktsegment), plain double sum  (string keys)
    group_dict  + groupBy(seg_id) dense-int keys, names re-attached
                (the plan q03's CBO gate picks at this size)
    full        q03 itself (limb-exact dsum + ORDER BY)

Stage cost ~= variant[i] - variant[i-1]; the residue full - scan that
DuckDB doesn't pay is the floor under adjudication. Usage:

    python scripts/q03_breakdown.py [--dir /tmp/sfsynth100b] [--passes 6]

Prints one JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sfsynth100b")
    ap.add_argument("--passes", type=int, default=6)
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dicom_metadata_extractor_serverless_datalake_spark.queries.base import dsum
    from dicom_metadata_extractor_serverless_datalake_spark.queries.corpus import QUERIES
    from dicom_metadata_extractor_serverless_datalake_spark.session import get_spark
    from dicom_metadata_extractor_serverless_datalake_spark.sources.tables import load_table

    spark = get_spark(app_name="q03_breakdown")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    d = args.dir
    orders = load_table(spark, d, "orders")
    customer = load_table(spark, d, "customer")

    def v_sched():
        return spark.range(1).count()

    def v_scan():
        return orders.agg(F.sum("o_custkey"), F.sum("o_totalprice")).collect()

    def v_join():
        return (
            orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
            .agg(F.sum("o_totalprice"))
            .collect()
        )

    def v_group_str():
        return (
            orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.sum("o_totalprice").alias("rev"), F.count("*").alias("n"))
            .orderBy("c_mktsegment")
            .collect()
        )

    def v_group_dict():
        seg = customer.select("c_mktsegment").distinct().select(
            "c_mktsegment",
            F.row_number().over(Window.orderBy("c_mktsegment")).alias("seg_id"),
        )
        cust = customer.join(F.broadcast(seg), "c_mktsegment").select(
            "c_custkey", "seg_id"
        )
        agg = (
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("seg_id")
            .agg(F.sum("o_totalprice").alias("rev"), F.count("*").alias("n"))
        )
        return (
            agg.join(F.broadcast(seg), "seg_id")
            .select("c_mktsegment", "rev", "n")
            .orderBy("c_mktsegment")
            .collect()
        )

    def v_full():
        return QUERIES["q03_join_broadcast_agg"].spark_fn(spark, d).collect()

    spark_variants = {
        "sched": v_sched,
        "scan": v_scan,
        "join": v_join,
        "group_str": v_group_str,
        "group_dict": v_group_dict,
        "full": v_full,
    }

    duck_variants = {
        "sched": "SELECT 1",
        "scan": "SELECT SUM(o_custkey), SUM(o_totalprice) FROM orders",
        "join": (
            "SELECT SUM(o_totalprice) FROM orders"
            " JOIN customer ON o_custkey = c_custkey"
        ),
        "group_str": (
            "SELECT c_mktsegment, SUM(o_totalprice) AS rev, COUNT(*) AS n"
            " FROM orders JOIN customer ON o_custkey = c_custkey"
            " GROUP BY c_mktsegment ORDER BY c_mktsegment"
        ),
        "full": QUERIES["q03_join_broadcast_agg"].oracle,
    }

    con = None
    try:
        import duckdb

        con = duckdb.connect()
        from bench import _duck_views  # repo root is on sys.path (line 37)

        _duck_views(con, d)
    except Exception as e:  # noqa: BLE001 — spark-side numbers still useful
        print(f"duckdb side skipped: {type(e).__name__}: {e}", file=sys.stderr)

    times: dict[str, float] = {}
    duck: dict[str, float] = {}
    for p in range(args.passes):
        for name, fn in spark_variants.items():
            t0 = time.perf_counter()
            fn()
            dt = round(time.perf_counter() - t0, 3)
            if p and (name not in times or dt < times[name]):
                times[name] = dt
        if con is not None:
            for name, sql in duck_variants.items():
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                dt = round(time.perf_counter() - t0, 3)
                if p and (name not in duck or dt < duck[name]):
                    duck[name] = dt

    out = {"dir": d, "passes": args.passes, "spark": times, "duckdb": duck}
    if times and duck:
        out["ratio_full"] = round(times["full"] / max(duck["full"], 1e-9), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
