"""Codec + VR semantics unit tests (SURVEY §5 strategy items 1-2)."""

import datetime

import pytest

from dicom_metadata_extractor_serverless_datalake_spark.dicom import codec, vr
from dicom_metadata_extractor_serverless_datalake_spark.ingest.extract import flatten
from dicom_metadata_extractor_serverless_datalake_spark.schema import to_column_name

from fixtures import make_dcm


def _by_keyword(ds):
    return {e.keyword: e for e in ds if e.keyword}


def test_roundtrip_basic():
    data = make_dcm(1)
    assert codec.is_dicom(data)
    ds = codec.parse_dicom(data)
    kw = _by_keyword(ds)
    assert kw["Modality"].vr == "CS"
    assert isinstance(kw["Modality"].value, str)
    assert kw["PatientBirthDate"].vr == "DA"
    assert kw["Rows"].value == 600
    # stop_before_pixels: PixelData absent
    assert "PixelData" not in kw


def test_pn_parse():
    ds = codec.parse_dicom(make_dcm(2))
    pn = _by_keyword(ds)["PatientName"].value
    assert isinstance(pn, codec.PersonName)
    assert pn.family_name == "Family2"
    assert pn.name_suffix == "Jr"


def test_multivalue_arrays():
    ds = codec.parse_dicom(make_dcm(3))
    kw = _by_keyword(ds)
    assert kw["ImageType"].value == ["ORIGINAL", "PRIMARY"]
    assert kw["PatientOrientation"].value == ["L", "P"]


def test_sequence_parse():
    ds = codec.parse_dicom(make_dcm(4))
    sq = _by_keyword(ds)["ReferencedStudySequence"]
    assert sq.vr == "SQ"
    assert len(sq.value) == 1
    item = _by_keyword(sq.value[0])
    assert item["StudyInstanceUID"].value == "1.2.3.4"


def test_invalid_magic_raises():
    with pytest.raises(codec.DicomParseError):
        codec.parse_dicom(b"\x00" * 200)


# --- VR conversion semantics (quirks Q1-Q3, src/utils/tags.py) ---

def _elem(keyword, vrcode, value, vm="1"):
    return codec.Element(tag=(0, 0), vr=vrcode, value=value, keyword=keyword, vm=vm)


def test_q1_us_is_string():
    # US resolves to rep_string (duplicate-key quirk): single -> str(int)
    assert vr.convert(_elem("Rows", "US", 600)) == "600"


def test_q3_vm_gt1_always_list():
    # max VM > 1 -> list even for a single present value
    assert vr.convert(_elem("ImageType", "CS", "ORIGINAL", vm="2-n")) == ["ORIGINAL"]
    assert vr.convert(_elem("ImageType", "CS", ["A", "B"], vm="2-n")) == ["A", "B"]


def test_q2_empty_da_default():
    assert vr.convert(_elem("StudyDate", "DA", "")) == datetime.date(1900, 1, 1)
    assert vr.convert(_elem("StudyDate", "DA", "19990101")) == datetime.date(1999, 1, 1)


def test_integer_vrs_return_strings():
    assert vr.convert(_elem("X", "UL", 7)) == "7"
    assert vr.convert(_elem("X", "UL", None)) == 0  # empty -> int 0


def test_pn_empty_struct():
    out = vr.convert(_elem("PatientName", "PN", ""))
    assert out == dict.fromkeys(vr.PN_FIELDS, "")


def test_unknown_vr_raises():
    with pytest.raises(ValueError):
        vr.convert(_elem("X", "ZZ", "v"))


def test_flatten_partition_backfill():
    # Q2: record with no StudyDate lands in partition 1979-01-01
    ds = codec.parse_dicom(make_dcm(9, omit_study_date=True))
    row = flatten(ds, {"bucket": "b", "region": None, "key": "k", "archive_path": "k"})
    assert row["study_date"] == datetime.date(1979, 1, 1)
    assert row["error"] is None
    assert row["source_s3_key"] == "k"
    assert isinstance(row["extra_tags"], dict)
    assert row["extra_tags"]["Rows"] == "600"  # Q1 stringified US
    # SQ flattened into extra_tags deterministically
    assert "ReferencedStudySequence" in row["extra_tags"]


def test_column_naming():
    assert to_column_name("StudyDate") == "study_date"
    assert to_column_name("SOPClassUID") == "sopclass_uid"
    assert to_column_name("PatientBirthDate") == "patient_birth_date"


def test_parse_reference_samples():
    """Cross-check the parser against the reference's pydicom-written
    sample files (read-only fixtures, sample_dcm/)."""
    import pathlib

    sample = pathlib.Path("/root/reference/sample_dcm/example-0")
    if not sample.exists():
        pytest.skip("reference samples unavailable")
    ds = codec.parse_dicom(sample.read_bytes())
    kw = _by_keyword(ds)
    assert "Modality" in kw
    assert kw["StudyDate"].vr == "DA"
