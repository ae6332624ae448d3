"""Property-based codec tests (hypothesis): arbitrary tag values survive
the write -> parse -> flatten pipeline with pinned types — the schema-
drift failure class (SURVEY §7 hard-part 1) cannot regress silently."""

import datetime
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from dicom_metadata_extractor_serverless_datalake_spark.dicom import codec
from dicom_metadata_extractor_serverless_datalake_spark.ingest.extract import flatten
from dicom_metadata_extractor_serverless_datalake_spark.schema import INGEST_SCHEMA

_LINEAGE = {
    "source_s3_bucket": "b",
    "source_s3_region": "r",
    "source_s3_key": "k",
    "source_s3_archive_path": None,
}

# DICOM string payloads: printable ASCII minus the backslash (the VM
# separator) — multi-valuedness is exercised via explicit lists instead
_dicom_text = st.text(
    alphabet=string.ascii_letters + string.digits + " .-_",
    min_size=1,
    max_size=16,
).filter(lambda s: s.strip(" ") != "")  # all-space values decode to null (empty element)

_dates = st.dates(
    min_value=datetime.date(1900, 1, 1), max_value=datetime.date(2099, 12, 31)
)


@settings(max_examples=50, deadline=None)
@given(
    modality=_dicom_text,
    study_id=_dicom_text,
    study_date=_dates,
    orientation=st.lists(_dicom_text, min_size=1, max_size=3),
)
def test_flatten_types_are_pinned(modality, study_id, study_date, orientation):
    data = codec.write_dicom(
        {
            "Modality": modality,
            "StudyID": study_id,
            "StudyDate": study_date.strftime("%Y%m%d"),
            "PatientOrientation": orientation,
        }
    )
    row = flatten(codec.parse_dicom(data), _LINEAGE)
    # PS3.5 §6.2: only trailing padding of the whole value strips
    assert row["modality"] == modality.rstrip(" ")
    assert row["study_id"] == study_id.rstrip(" ")
    assert row["study_date"] == study_date
    # Q3: VM>1 tag is ALWAYS a list, even with one value present
    assert isinstance(row["patient_orientation"], list)
    want = orientation[:-1] + [orientation[-1].rstrip(" ")]
    assert row["patient_orientation"] == want


@settings(max_examples=50, deadline=None)
@given(series_number=st.integers(min_value=0, max_value=10**9))
def test_is_vr_stays_string(series_number):
    # reference fidelity: IS (return_integer) yields *strings* (Q1 family)
    data = codec.write_dicom({"SeriesNumber": str(series_number)})
    row = flatten(codec.parse_dicom(data), _LINEAGE)
    assert row["series_number"] == str(series_number)
    assert isinstance(row["series_number"], str)


@settings(max_examples=30, deadline=None)
@given(
    family=_dicom_text,
    given_name=_dicom_text,
)
def test_pn_struct_roundtrip(family, given_name):
    data = codec.write_dicom({"PatientName": f"{family}^{given_name}"})
    row = flatten(codec.parse_dicom(data), _LINEAGE)
    pn = row["patient_name"]
    # PS3.5 §6.2: only *trailing* padding of the whole value is
    # insignificant; leading/internal spaces survive. The given-name
    # component sits at the end of the value, so it loses trailing
    # spaces; the family component is interior and survives verbatim.
    assert pn["family_name"] == family
    assert pn["given_name"] == given_name.rstrip(" ")
    # all 7 fields always present (empty-string struct contract)
    assert len(pn) == 7 and all(isinstance(v, str) for v in pn.values())


@settings(max_examples=30, deadline=None)
@given(keys=st.sets(st.sampled_from(["Modality", "StudyID", "PatientAge", "PatientSex"]), min_size=0, max_size=4))
def test_missing_tags_yield_nulls_not_schema_drift(keys):
    tags = {k: "X1" for k in keys}
    tags["StudyDate"] = "20200101"
    row = flatten(codec.parse_dicom(codec.write_dicom(tags)), _LINEAGE)
    # the row always carries the full canonical column set
    assert set(row.keys()) == {f.name for f in INGEST_SCHEMA.fields}


# ---------------------------------------------------------------------------
# Misra-Gries partition summaries (operators/heavyhitters.py): the
# deterministic guarantee must hold for ANY stream, partitioning, and k —
# pure-Python property test over the partition kernel + the sum-merge the
# Spark side performs (mergeable-summaries theorem).
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    stream=st.lists(st.integers(min_value=0, max_value=12), max_size=400),
    k=st.integers(min_value=1, max_value=8),
    n_parts=st.integers(min_value=1, max_value=5),
)
def test_misra_gries_bounds_any_stream_any_partitioning(stream, k, n_parts):
    import pandas as pd

    from collections import Counter

    from dicom_metadata_extractor_serverless_datalake_spark.operators.heavyhitters import _mg_partition

    # split the stream into contiguous partitions
    chunk = max(1, -(-len(stream) // n_parts))
    parts = [stream[i : i + chunk] for i in range(0, len(stream), chunk)] or [[]]

    merged: Counter = Counter()
    err = 0
    for p in parts:
        [out] = list(_mg_partition(k, "item")(iter([pd.DataFrame({"item": p})])))
        budget = int(out["part_budget"].iloc[0]) if len(out) else 0
        assert budget >= 0  # truncation can only remove mass
        err += budget // (k + 1)
        for item, est in zip(out["item"], out["est"]):
            if item is not None and not pd.isna(item) and est > 0:
                merged[int(item)] += int(est)

    exact = Counter(stream)
    n = len(stream)
    assert err <= n // (k + 1)
    for item, cnt in exact.items():
        if cnt > err:  # guarantee 1: true-heavy items are present
            assert item in merged, (item, cnt, err)
    for item, est in merged.items():  # guarantee 2: bracketing
        assert est <= exact[item] <= est + err, (item, est, exact[item], err)
