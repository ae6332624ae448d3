"""De-identification pass (dicom/deid.py): pseudonym stability, interval
preservation, Safe-Harbor generalization, default-deny extra_tags — over
a real ingested fixture lake (no hand-built frames on the happy path, so
the test catches schema drift between ingest and deid)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from fixtures import write_fixture_tree
from dicom_metadata_extractor_serverless_datalake_spark.dicom.deid import SAFE_EXTRA_TAGS, UID_EXTRA_TAGS, deidentify
from dicom_metadata_extractor_serverless_datalake_spark.ingest.pipeline import ingest_batch
from dicom_metadata_extractor_serverless_datalake_spark.schema import DICOM_METADATA_SCHEMA


@pytest.fixture(scope="module")
def lake_df(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("deid_fixtures")
    write_fixture_tree(root)
    out = tmp_path_factory.mktemp("deid_lake")
    ingest_batch(spark, str(root), str(out / "lake"), str(out / "q"))
    return spark.read.schema(DICOM_METADATA_SCHEMA).parquet(str(out / "lake"))


def test_deid_schema_and_identifier_scrub(spark, lake_df):
    out = deidentify(lake_df, salt="s1")

    # schema unchanged (the export is a drop-in lake)
    assert out.schema == lake_df.schema

    rows = out.collect()
    orig = lake_df.collect()
    assert len(rows) == len(orig)

    # every original direct identifier is gone from every string cell
    originals = set()
    for r in orig:
        pn = r["patient_name"]
        if pn and pn["family_name"]:
            originals.add(pn["family_name"])
        if r["extra_tags"] and "PatientID" in r["extra_tags"]:
            originals.add(r["extra_tags"]["PatientID"])
        if r["sop_instance_uid"]:
            originals.add(r["sop_instance_uid"])
    assert originals  # fixtures really carry identifiers

    def all_strings(row) -> list[str]:
        vals = []
        for v in row:
            if isinstance(v, str):
                vals.append(v)
            elif isinstance(v, dict):
                vals.extend(str(x) for x in [*v.keys(), *v.values()] if x)
            elif isinstance(v, (list, tuple)) or hasattr(v, "__fields__"):
                vals.extend(str(x) for x in v if x)
        return vals

    for r in rows:
        for s in all_strings(r):
            for ident in originals:
                assert ident not in s, (ident, s)

    # PN: pseudonym in family_name, all other components null
    for r in rows:
        pn = r["patient_name"]
        assert pn["family_name"].startswith("anon-")
        assert pn["given_name"] is None and pn["name_prefix"] is None

    # free text nulled; birth date year-floored
    for r in rows:
        assert r["image_comments"] is None
        if r["patient_birth_date"] is not None:
            assert (r["patient_birth_date"].month, r["patient_birth_date"].day) == (1, 1)

    # extra_tags: default-deny allowlist; UID-ish keys pseudonymized
    for r in rows:
        tags = r["extra_tags"] or {}
        assert set(tags) <= (SAFE_EXTRA_TAGS | UID_EXTRA_TAGS)
        for k in set(tags) & UID_EXTRA_TAGS:
            assert len(tags[k]) == 32 and all(c in "0123456789abcdef" for c in tags[k])


def test_deid_determinism_and_salt_severing(spark, lake_df):
    a = {r["sop_instance_uid"] for r in deidentify(lake_df, salt="s1").collect()}
    b = {r["sop_instance_uid"] for r in deidentify(lake_df, salt="s1").collect()}
    c = {r["sop_instance_uid"] for r in deidentify(lake_df, salt="OTHER").collect()}
    assert a == b  # same salt -> linkable exports
    assert a.isdisjoint(c)  # fresh salt severs linkage

    # determinism is partition-independent (hash depends on values only)
    d = {
        r["sop_instance_uid"]
        for r in deidentify(lake_df.repartition(7), salt="s1").collect()
    }
    assert a == d


def _full_row(**overrides):
    base = {f.name: None for f in DICOM_METADATA_SCHEMA.fields}
    base.update(overrides)
    return base


def test_deid_interval_preservation_and_patient_grouping(spark):
    def row(pid, study_date, sop):
        return _full_row(
            patient_name={
                "family_name": "Fam", "given_name": "Giv", "ideographic": None,
                "middle_name": None, "name_prefix": None, "name_suffix": None,
                "phonetic": None,
            },
            extra_tags={"PatientID": pid, "Manufacturer": "ACME"},
            sop_instance_uid=sop,
            study_date=study_date,
        )

    df = spark.createDataFrame(
        [
            row("P1", datetime.date(2021, 3, 1), "1.1"),
            row("P1", datetime.date(2021, 3, 11), "1.2"),
            row("P2", datetime.date(2021, 3, 1), "2.1"),
        ],
        DICOM_METADATA_SCHEMA,
    )
    out = {r["sop_instance_uid"]: r for r in deidentify(df, salt="s1").collect()}
    # map back by pseudonymized sop uid: recompute the pseudonyms
    import hashlib

    def h(v):
        return hashlib.sha256(("s1" + v).encode()).hexdigest()[:32]

    d11, d12, d21 = (out[h(s)]["study_date"] for s in ["1.1", "1.2", "2.1"])
    # same patient: the 10-day interval survives the shift exactly
    assert (d12 - d11).days == 10
    # shift bounded
    assert abs((d11 - datetime.date(2021, 3, 1)).days) <= 30
    # same patient -> same pseudonym; different patient -> different
    p11 = out[h("1.1")]["patient_name"]["family_name"]
    p12 = out[h("1.2")]["patient_name"]["family_name"]
    p21 = out[h("2.1")]["patient_name"]["family_name"]
    assert p11 == p12 != p21


def test_deid_age_coarsening_and_no_identity_row(spark):
    df = spark.createDataFrame(
        [
            _full_row(patient_age="099Y", sop_instance_uid="a"),
            _full_row(patient_age="045Y", sop_instance_uid="b"),
            _full_row(patient_age="011M", sop_instance_uid="c"),
            _full_row(patient_age=None, sop_instance_uid="d"),
        ],
        DICOM_METADATA_SCHEMA,
    )
    got = {r["sop_instance_uid"]: r for r in deidentify(df, salt="z").collect()}
    import hashlib

    def h(v):
        return hashlib.sha256(("z" + v).encode()).hexdigest()[:32]

    assert got[h("a")]["patient_age"] == "090Y+"
    assert got[h("b")]["patient_age"] == "045Y"
    assert got[h("c")]["patient_age"] == "011M"
    assert got[h("d")]["patient_age"] is None
    # no identity anywhere -> pseudonym stays NULL (nothing to link)
    for r in got.values():
        assert r["patient_name"] is None


def test_deid_is_streaming_safe(spark, lake_df, tmp_path):
    """deidentify is a pure projection (no shuffle/agg), so it must
    apply unchanged to a readStream of the lake — the shape a
    continuous export pipeline uses."""
    src = str(tmp_path / "stream_lake")
    lake_df.write.parquet(src)
    stream = spark.readStream.schema(DICOM_METADATA_SCHEMA).parquet(src)
    out = deidentify(stream, salt="s1")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("deid_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["sop_instance_uid"] for r in spark.sql("SELECT * FROM deid_stream").collect()}
    want = {r["sop_instance_uid"] for r in deidentify(lake_df, salt="s1").collect()}
    assert got == want and got


def test_deid_90_plus_hides_birth_year_and_sentinel_unshifted(spark):
    rows = [
        _full_row(sop_instance_uid="a", patient_age="099Y",
                  patient_birth_date=datetime.date(1926, 5, 2),
                  study_date=datetime.date(2021, 3, 1)),
        _full_row(sop_instance_uid="b", patient_age=None,   # 90+ by dates alone
                  patient_birth_date=datetime.date(1920, 7, 9),
                  study_date=datetime.date(2021, 3, 1)),
        _full_row(sop_instance_uid="c", patient_age="90Y",  # non-padded AS value
                  patient_birth_date=None,
                  study_date=datetime.date(2021, 3, 1)),
        _full_row(sop_instance_uid="d", patient_age="045Y",
                  patient_birth_date=datetime.date(1980, 5, 2),
                  study_date=datetime.date(1979, 1, 1)),    # backfill sentinel
    ]
    df = spark.createDataFrame(rows, DICOM_METADATA_SCHEMA)
    import hashlib

    def h(v):
        return hashlib.sha256(("z" + v).encode()).hexdigest()[:32]

    got = {r["sop_instance_uid"]: r for r in deidentify(df, salt="z").collect()}
    # 90+ by age tag: birth date gone, not year-floored
    assert got[h("a")]["patient_age"] == "090Y+"
    assert got[h("a")]["patient_birth_date"] is None
    # 90+ by dates alone: still aggregated
    assert got[h("b")]["patient_age"] == "090Y+"
    assert got[h("b")]["patient_birth_date"] is None
    # sloppy non-padded '90Y' is caught
    assert got[h("c")]["patient_age"] == "090Y+"
    # under-90: year floor as before
    assert got[h("d")]["patient_birth_date"] == datetime.date(1980, 1, 1)
    # the missing-StudyDate backfill sentinel never shifts
    assert got[h("d")]["study_date"] == datetime.date(1979, 1, 1)


def test_deid_identity_is_positional_not_concat_ws(spark):
    def pn(fam, giv, mid):
        return {
            "family_name": fam, "given_name": giv, "ideographic": None,
            "middle_name": mid, "name_prefix": None, "name_suffix": None,
            "phonetic": None,
        }

    df = spark.createDataFrame(
        [
            _full_row(sop_instance_uid="x", patient_name=pn("Doe", "John", None)),
            _full_row(sop_instance_uid="y", patient_name=pn("Doe", None, "John")),
        ],
        DICOM_METADATA_SCHEMA,
    )
    out = deidentify(df, salt="z").collect()
    pseuds = {r["patient_name"]["family_name"] for r in out}
    assert len(pseuds) == 2  # structurally different names stay distinct
