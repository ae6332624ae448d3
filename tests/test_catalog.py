"""Catalog DDL / MSCK / schema evolution (SURVEY §2.A rows 22-24) and
JSON/CSV query sources (§2.B scans row — the reference ignores these on
ingest but they remain valid query inputs)."""

from pyspark.sql import functions as F

from dicom_metadata_extractor_serverless_datalake_spark.plans import physical_plan
from dicom_metadata_extractor_serverless_datalake_spark.sources.catalog import (
    merged_schema_read,
    register_external_table,
    repair_table,
)
from dicom_metadata_extractor_serverless_datalake_spark.sources.tables import load_table


def test_external_table_msck_and_pruning(spark, tmp_path_factory):
    lake = str(tmp_path_factory.mktemp("lake"))
    df = spark.range(100).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "2021-01-01").otherwise("2021-01-02").alias("study_date"),
    )
    df.write.partitionBy("study_date").parquet(lake, mode="overwrite")

    fq = register_external_table(spark, "t_lake", lake, "study_date", database="dicom_db")
    got = spark.sql(f"SELECT count(*) c FROM {fq} WHERE study_date = '2021-01-01'").collect()
    assert got[0]["c"] == 50

    # partition pruning: the scan must carry a partition filter
    plan = physical_plan(spark.sql(f"SELECT id FROM {fq} WHERE study_date = '2021-01-01'"))
    assert "PartitionFilters" in plan and "study_date" in plan

    # late-arriving partition: new directory invisible until MSCK re-run
    extra = df.filter(F.col("id") < 5).withColumn("study_date", F.lit("2021-02-01"))
    extra.write.partitionBy("study_date").parquet(lake, mode="append")
    repair_table(spark, fq)
    assert spark.sql(f"SELECT count(*) c FROM {fq}").collect()[0]["c"] == 105
    spark.sql(f"DROP TABLE {fq}")


def test_merge_schema_evolution(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("evolve"))
    spark.range(10).select("id").write.parquet(path + "/batch=1")
    spark.range(10).select("id", (F.col("id") * 2).alias("extra")).write.parquet(
        path + "/batch=2"
    )
    df = merged_schema_read(spark, path)
    assert set(df.columns) >= {"id", "extra"}
    # rows from the old files surface null for the new column
    assert df.filter(F.col("extra").isNull()).count() == 10


def test_json_csv_roundtrip_sources(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("fmt")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    nation.write.json(str(out / "nation_json"))
    nation.write.option("header", "true").csv(str(out / "nation_csv"))

    via_json = spark.read.json(str(out / "nation_json"))
    via_csv = spark.read.option("header", "true").option("inferSchema", "true").csv(
        str(out / "nation_csv")
    )
    want = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in nation.collect()}
    assert {(r.n_nationkey, r.n_name, r.n_regionkey) for r in via_json.collect()} == want
    assert {(r.n_nationkey, r.n_name, r.n_regionkey) for r in via_csv.collect()} == want


def test_orc_roundtrip_source(spark, sf_dir, tmp_path_factory):
    """ORC read/write (built into Spark): schema and rows survive a
    round-trip, including nested complex types."""
    from pyspark.sql import functions as F

    out = tmp_path_factory.mktemp("orc")
    src = load_table(spark, sf_dir, "nation").select(
        "n_nationkey",
        "n_name",
        F.struct("n_regionkey", F.length("n_name").alias("name_len")).alias("meta"),
        F.array("n_nationkey", "n_regionkey").alias("keys"),
    )
    src.write.orc(str(out / "nation_orc"))
    back = spark.read.orc(str(out / "nation_orc"))
    assert [(f.name, f.dataType.simpleString()) for f in back.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in src.schema.fields
    ]
    key = lambda r: (r.n_nationkey, r.n_name, r.meta.n_regionkey, tuple(r.keys))  # noqa: E731
    assert sorted(map(key, back.collect())) == sorted(map(key, src.collect()))


def test_ingest_with_external_catalog_table(spark, tmp_path_factory):
    """Full reference lifecycle with a persistent catalog table: ingest
    fixtures -> external partitioned table -> MSCK -> pruned SQL."""
    from dicom_metadata_extractor_serverless_datalake_spark.ingest import run_ingest

    from fixtures import write_fixture_tree

    root = tmp_path_factory.mktemp("cat_in")
    write_fixture_tree(root)
    out = tmp_path_factory.mktemp("cat_out")
    df = run_ingest(
        spark, str(root), str(out / "lake"), str(out / "quar"),
        table="dicom_external", external=True,
    )
    assert df.count() > 0
    n = spark.sql(
        "SELECT count(*) c FROM dicom_external WHERE study_date >= DATE'1990-01-01'"
    ).collect()[0]["c"]
    assert 0 < n <= df.count()
    # CBO statistics on the registered lake table
    from dicom_metadata_extractor_serverless_datalake_spark.sources.catalog import analyze_table

    stats = analyze_table(spark, "dicom_external", columns=["modality"])
    assert "rows" in stats.get("Statistics", "")
    spark.sql("DROP TABLE dicom_external")


def test_bucketed_join_is_exchange_free(spark, sf_dir, tmp_path_factory):
    """Co-bucketed fact tables join without a shuffle: the scan feeds the
    join directly (the write amortized the exchange)."""
    from pyspark.sql import functions as F

    from dicom_metadata_extractor_serverless_datalake_spark.plans import exchange_count
    from dicom_metadata_extractor_serverless_datalake_spark.sources.bucketing import cobucket_join, write_bucketed

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=4)
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders", "l_orderkey", n_buckets=4,
    )
    try:
        joined = cobucket_join(spark, "b_lineitem", "b_orders", "l_orderkey")
        agg = joined.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        # no shuffle for the join AND none for the groupBy (same key)
        assert exchange_count(agg) == 0
        # results equal the plain-join formulation
        plain = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_range_sorted_write_clusters_keys(spark, sf_dir, tmp_path_factory):
    """Range-sorted lake: files own disjoint sorted key ranges, so range
    predicates skip whole files via row-group stats."""
    import glob

    import pyarrow.parquet as pq

    from dicom_metadata_extractor_serverless_datalake_spark.sources.bucketing import write_range_sorted

    out = str(tmp_path_factory.mktemp("sorted") / "orders")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_range_sorted(orders, out, "o_totalprice", n_partitions=4)

    ranges = []
    for f in glob.glob(out + "/part-*.parquet"):
        t = pq.read_table(f, columns=["o_totalprice"])
        vals = t["o_totalprice"].to_pylist()
        if vals:
            assert vals == sorted(vals)  # sorted within file
            ranges.append((min(vals), max(vals)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint ranges across files
    assert spark.read.parquet(out).count() == orders.count()


def test_corrupt_lake_file_handling(spark, sf_dir, tmp_path_factory):
    """Ops contract for a damaged lake object: the default read fails
    loudly; spark.sql.files.ignoreCorruptFiles=true reads through,
    losing only the damaged file's rows."""
    import pytest as _pytest

    out = tmp_path_factory.mktemp("corrupt")
    nation = load_table(spark, sf_dir, "nation")
    nation.coalesce(1).write.parquet(str(out / "lake"))
    (out / "lake" / "zzz-corrupt.parquet").write_bytes(b"PAR1 this is not parquet")

    with _pytest.raises(Exception):
        spark.read.parquet(str(out / "lake")).count()

    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        n = spark.read.parquet(str(out / "lake")).count()
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
    assert n == nation.count()


def test_analyze_table_records_stats(spark, tmp_path):
    """ANALYZE TABLE must land row-count/size statistics in the catalog
    (the CBO's input) and column-level ndv/min/max when asked."""
    from dicom_metadata_extractor_serverless_datalake_spark.sources.catalog import analyze_table

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    df.write.mode("overwrite").saveAsTable("stats_probe")
    try:
        stats = analyze_table(spark, "stats_probe", columns=["o_custkey", "o_totalprice"])
        assert "Statistics" in stats
        assert "rows" in stats["Statistics"]
        desc = spark.sql(
            "DESCRIBE EXTENDED stats_probe o_custkey"
        ).collect()
        info = {r.info_name: r.info_value for r in desc}
        assert info.get("distinct_count") not in (None, "NULL")
    finally:
        spark.sql("DROP TABLE IF EXISTS stats_probe")


def test_bucketed_marker_layout_roundtrip(spark, tmp_path):
    """A dataset dir shipping a {name}.bucketed.json marker makes
    load_table register an external bucketed table over the SAME
    parquet files: rows identical to a plain read, and groupBy on the
    bucket column plans with NO exchange (the point of the layout)."""
    import json

    from dicom_metadata_extractor_serverless_datalake_spark.sources.tables import load_table

    src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    loc = str(tmp_path / "lineitem.bucketed")
    spark.sql("DROP TABLE IF EXISTS bucketed_probe")
    (
        src.write.bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", loc)
        .format("parquet")
        .saveAsTable("bucketed_probe")
    )
    (tmp_path / "lineitem.bucketed.json").write_text(
        json.dumps(
            {
                "location": loc,
                "bucket_col": "l_orderkey",
                "sort_col": "l_orderkey",
                "num_buckets": 4,
                "schema_ddl": src.schema.toDDL(),
            }
        )
    )
    try:
        df = load_table(spark, str(tmp_path), "lineitem")
        assert df.count() == src.count()
        agg = df.groupBy("l_orderkey").count()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        # plain-read parity on an aggregate
        a = sorted(map(tuple, agg.collect()))
        b = sorted(map(tuple, src.groupBy("l_orderkey").count().collect()))
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_probe")
