"""Right-to-erasure purge (operators/purge.py): row deletion bounded to
affected partitions, untouched partitions byte-identical, emptied
partitions removed, exact count conservation."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from fixtures import write_fixture_tree
from dicom_metadata_extractor_serverless_datalake_spark import DicomLake
from dicom_metadata_extractor_serverless_datalake_spark.ingest.pipeline import ingest_batch


@pytest.fixture()
def lake(spark, tmp_path):
    root = tmp_path / "src"
    root.mkdir()
    write_fixture_tree(root)
    ingest_batch(spark, str(root), str(tmp_path / "lake"), str(tmp_path / "q"))
    return DicomLake(spark, str(tmp_path / "lake"), quarantine_path=str(tmp_path / "q"))


def _file_census(lake_path: str) -> dict[str, list[tuple[str, int, float]]]:
    out: dict[str, list[tuple[str, int, float]]] = {}
    for entry in sorted(os.listdir(lake_path)):
        pdir = os.path.join(lake_path, entry)
        if os.path.isdir(pdir) and "=" in entry:
            out[entry] = sorted(
                (f, os.path.getsize(os.path.join(pdir, f)), os.path.getmtime(os.path.join(pdir, f)))
                for f in os.listdir(pdir)
                if f.endswith(".parquet")
            )
    return out


def test_purge_one_patient_touches_only_their_partitions(spark, lake):
    df = lake.df()
    total = df.count()
    victim = df.filter(F.col("patient_name").isNotNull()).select(
        F.col("patient_name.family_name").alias("fam"), "study_date"
    ).first()
    pred = F.col("patient_name.family_name") == victim["fam"]
    n_victim = df.filter(pred).count()
    victim_parts = {
        f"study_date={r[0]}" for r in df.filter(pred).select("study_date").distinct().collect()
    }
    before = _file_census(lake.lake_path)

    stats = lake.purge(pred)
    assert stats["rows_purged"] == n_victim
    assert stats["partitions_rewritten"] + stats["partitions_removed"] == len(victim_parts)

    after = _file_census(lake.lake_path)
    out = lake.df()
    assert out.count() == total - n_victim
    assert out.filter(pred).count() == 0
    # untouched partitions: identical file lists, sizes AND mtimes
    for p, files in before.items():
        if p not in victim_parts:
            assert after[p] == files, p
    # affected partitions changed (or vanished)
    for p in victim_parts:
        assert after.get(p) != before[p], p


def test_purge_empties_whole_partition_and_removes_dir(spark, lake):
    # the 1979-01-01 backfill partition: purge every row in it
    pred = F.col("study_date") == datetime.date(1979, 1, 1)
    n = lake.df().filter(pred).count()
    assert n > 0
    stats = lake.purge(pred)
    assert stats == {
        "rows_purged": n,
        "rows_kept_in_rewritten": 0,
        "partitions_rewritten": 0,
        "partitions_removed": 1,
    }
    assert "study_date=1979-01-01" not in _file_census(lake.lake_path)
    assert lake.df().filter(pred).count() == 0


def test_purge_no_match_is_a_noop(spark, lake):
    before = _file_census(lake.lake_path)
    stats = lake.purge(F.col("modality") == "NO-SUCH-MODALITY")
    assert stats["rows_purged"] == 0
    assert stats["partitions_rewritten"] == stats["partitions_removed"] == 0
    assert _file_census(lake.lake_path) == before


def test_purge_quarantine_reaches_the_dlq(spark, lake):
    q = lake.quarantine()
    assert q is not None and q.count() == 1  # the empty DICOMDIR
    key = q.first()["source_s3_key"]
    stats = lake.purge_quarantine(F.col("source_s3_key") == key)
    assert stats == {"rows_purged": 1, "rows_kept": 0}
    left = lake.quarantine()
    assert left is None or left.count() == 0


def test_profile_one_row_per_column_with_exact_nulls(spark, lake):
    prof = {r["column"]: r for r in lake.profile().collect()}
    df = lake.df()
    assert set(prof) == {f.name for f in df.schema.fields}
    n = df.count()
    for r in prof.values():
        assert r["n_rows"] == n
    # exact null counts for a known-dense and a known-sparse column
    assert prof["modality"]["n_nulls"] == df.filter(F.col("modality").isNull()).count()
    assert prof["sop_instance_uid"]["approx_distinct"] > 0
    # nested columns render: patient_name min/max are JSON strings
    assert prof["patient_name"]["min"] is None or prof["patient_name"]["min"].startswith("{")


def test_purge_keeps_null_evaluating_rows_and_null_partitions(spark, tmp_path):
    """Three-valued logic: a row where the predicate evaluates to NULL
    is NOT a match and must survive; and a NULL partition value lives
    in __HIVE_DEFAULT_PARTITION__, which isin() alone would miss."""
    from dicom_metadata_extractor_serverless_datalake_spark.operators.purge import purge_rows

    lake = str(tmp_path / "generic_lake")
    df = spark.createDataFrame(
        [
            ("doe", "a", 1),
            (None, "a", 2),   # predicate NULL -> must be KEPT
            ("roe", "a", 3),
            ("doe", None, 4),  # match inside the NULL partition
            ("roe", None, 5),
        ],
        "name STRING, day STRING, id INT",
    )
    df.write.partitionBy("day").parquet(lake)

    stats = purge_rows(spark, lake, F.col("name") == "doe", partition_col="day")
    assert stats["rows_purged"] == 2
    left = spark.read.parquet(lake)
    ids = sorted(r["id"] for r in left.collect())
    assert ids == [2, 3, 5]  # the NULL-name row survived, both doe rows gone
    assert left.filter(F.col("day").isNull()).count() == 1
