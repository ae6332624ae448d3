"""Deterministic DICOM fixture generation (the generate_dcm.py role,
reference generate_dcm.py:11-75, reimplemented over our codec writer).
"""

from __future__ import annotations

import io
import random
import tarfile
import zipfile

from dicom_metadata_extractor_serverless_datalake_spark.dicom.codec import write_dicom

STUDY_DATES = ["20220814", "19990101", "19870403"]  # generate_dcm.py:16 pattern
MODALITIES = ["CT", "MR", "US", "XA"]


def make_dcm(seed: int, omit_study_date: bool = False, pixels: int = 2048) -> bytes:
    rng = random.Random(seed)
    tags: dict[str, object] = {
        "ImageType": ["ORIGINAL", "PRIMARY"],
        "SOPClassUID": "1.2.840.10008.5.1.4.1.1.7",
        "SOPInstanceUID": f"1.2.826.0.1.3680043.8.498.{seed}",
        "StudyTime": "093000.000000",
        "Modality": rng.choice(MODALITIES),
        "PatientName": f"Family{seed}^Given{seed}^M^Dr^Jr",
        "PatientID": f"PID{seed:06d}",
        "PatientBirthDate": rng.choice(["19700101", "19851231", "20011115"]),
        "PatientSex": rng.choice(["M", "F"]),
        "PatientAge": f"{rng.randint(1, 99):03d}Y",
        "PatientWeight": str(rng.randint(40, 120)),
        "PatientOrientation": ["L", "P"],
        "StudyID": f"SID{seed:04d}",
        "SeriesNumber": str(rng.randint(1, 9)),
        "InstanceNumber": str(rng.randint(1, 500)),
        "ImageComments": f"synthetic fixture {seed}",
        "Rows": 600,
        "Columns": 600,
        "SamplesPerPixel": 3,
        "PhotometricInterpretation": "RGB",
        "BitsAllocated": 8,
        "ReferencedStudySequence": [
            {"StudyInstanceUID": f"1.2.3.{seed}", "AccessionNumber": f"ACC{seed}"}
        ],
    }
    if not omit_study_date:
        tags["StudyDate"] = rng.choice(STUDY_DATES)
    return write_dicom(tags, pixel_data=bytes(rng.getrandbits(8) for _ in range(pixels)))


def make_zip(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return buf.getvalue()


def make_tar(members: dict[str, bytes], mode: str = "w") -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode=mode) as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def write_fixture_tree(root) -> dict[str, int]:
    """Materialize the sample_dcm/-equivalent fixture set under ``root``
    (pathlib.Path). Returns expected per-fixture valid-DICOM counts."""
    root.mkdir(parents=True, exist_ok=True)
    d0, d1, d3, d4, d5, d6 = (make_dcm(i) for i in range(6))
    no_date = make_dcm(99, omit_study_date=True)
    (root / "example-0").write_bytes(d0)
    (root / "example-6").write_bytes(d6)
    (root / "nodate-7.dcm").write_bytes(no_date)
    (root / "example.zip").write_bytes(
        make_zip({"example-1": d1, "example-3": d3, "DICOMDIR": b""})
    )
    (root / "example.tar").write_bytes(
        make_tar({"DICOMDIR": b"", "example-4": d4, "example-5": d5})
    )
    (root / "example.tar.gz").write_bytes(make_tar({"example-4": d4}, "w:gz"))
    (root / "example.tar.bz2").write_bytes(make_tar({"example-5": d5}, "w:bz2"))
    (root / "DICOMDIR").write_bytes(b"")  # negative: empty -> quarantine
    (root / "notes.txt").write_bytes(b"ignore me")
    (root / "meta.json").write_bytes(b"{}")
    (root / "index.csv").write_bytes(b"a,b")
    (root / "mixed.zip").write_bytes(
        make_zip({"good.dcm": d0, "bad.bin": b"\x00" * 200})
    )
    return {
        "bare": 3,        # example-0, example-6, nodate-7.dcm
        "zip": 2, "tar": 2, "tgz": 1, "tbz": 1, "mixed": 1,
        "lake_rows": 10, "quarantine_rows": 1,  # bare DICOMDIR
    }
