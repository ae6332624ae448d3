"""Minimal DICOM data dictionary (public registry, NEMA PS3.6 table 6-1).

Maps (group, element) -> (VR, VM, keyword) for the tags the engine
extracts as named columns plus the common tags exercised by fixtures.
Tags absent from this dictionary have no keyword and are skipped by the
flattener — mirroring the reference's ``if elem.keyword`` guard
(reference: src/dicomwrapper.py:42). Private tags are dropped wholesale
(reference: src/app.py:76 ``remove_private_tags``).

VM is the PS3.6 value-multiplicity string ('1', '1-n', '2', '3', ...);
``max_vm > 1`` drives the scalar-vs-array decision in the VR layer
(reference: src/utils/tags.py:115-141 ``validate_vm``).
"""

from __future__ import annotations

# (group, elem): (VR, VM, keyword)
DICOM_DICT: dict[tuple[int, int], tuple[str, str, str]] = {
    # --- file meta (group 0002, always explicit VR little endian) ---
    (0x0002, 0x0000): ("UL", "1", "FileMetaInformationGroupLength"),
    (0x0002, 0x0001): ("OB", "1", "FileMetaInformationVersion"),
    (0x0002, 0x0002): ("UI", "1", "MediaStorageSOPClassUID"),
    (0x0002, 0x0003): ("UI", "1", "MediaStorageSOPInstanceUID"),
    (0x0002, 0x0010): ("UI", "1", "TransferSyntaxUID"),
    (0x0002, 0x0012): ("UI", "1", "ImplementationClassUID"),
    (0x0002, 0x0013): ("SH", "1", "ImplementationVersionName"),
    # --- group 0008 ---
    (0x0008, 0x0005): ("CS", "1-n", "SpecificCharacterSet"),
    (0x0008, 0x0008): ("CS", "2-n", "ImageType"),
    (0x0008, 0x0016): ("UI", "1", "SOPClassUID"),
    (0x0008, 0x0018): ("UI", "1", "SOPInstanceUID"),
    (0x0008, 0x0020): ("DA", "1", "StudyDate"),
    (0x0008, 0x0021): ("DA", "1", "SeriesDate"),
    (0x0008, 0x0022): ("DA", "1", "AcquisitionDate"),
    (0x0008, 0x0023): ("DA", "1", "ContentDate"),
    (0x0008, 0x002A): ("DT", "1", "AcquisitionDateTime"),
    (0x0008, 0x0030): ("TM", "1", "StudyTime"),
    (0x0008, 0x0031): ("TM", "1", "SeriesTime"),
    (0x0008, 0x0032): ("TM", "1", "AcquisitionTime"),
    (0x0008, 0x0033): ("TM", "1", "ContentTime"),
    (0x0008, 0x0050): ("SH", "1", "AccessionNumber"),
    (0x0008, 0x0060): ("CS", "1", "Modality"),
    (0x0008, 0x0070): ("LO", "1", "Manufacturer"),
    (0x0008, 0x0080): ("LO", "1", "InstitutionName"),
    (0x0008, 0x0090): ("PN", "1", "ReferringPhysicianName"),
    (0x0008, 0x1030): ("LO", "1", "StudyDescription"),
    (0x0008, 0x103E): ("LO", "1", "SeriesDescription"),
    (0x0008, 0x1048): ("PN", "1-n", "PhysiciansOfRecord"),
    (0x0008, 0x1090): ("LO", "1", "ManufacturerModelName"),
    (0x0008, 0x1110): ("SQ", "1", "ReferencedStudySequence"),
    (0x0008, 0x1140): ("SQ", "1", "ReferencedImageSequence"),
    # --- group 0010 (patient) ---
    (0x0010, 0x0010): ("PN", "1", "PatientName"),
    (0x0010, 0x0020): ("LO", "1", "PatientID"),
    (0x0010, 0x0030): ("DA", "1", "PatientBirthDate"),
    (0x0010, 0x0040): ("CS", "1", "PatientSex"),
    (0x0010, 0x1010): ("AS", "1", "PatientAge"),
    (0x0010, 0x1020): ("DS", "1", "PatientSize"),
    (0x0010, 0x1030): ("DS", "1", "PatientWeight"),
    (0x0010, 0x21B0): ("LT", "1", "AdditionalPatientHistory"),
    # --- group 0018 (acquisition) ---
    (0x0018, 0x0015): ("CS", "1", "BodyPartExamined"),
    (0x0018, 0x0050): ("DS", "1", "SliceThickness"),
    (0x0018, 0x0060): ("DS", "1", "KVP"),
    (0x0018, 0x1020): ("LO", "1-n", "SoftwareVersions"),
    (0x0018, 0x1151): ("IS", "1", "XRayTubeCurrent"),
    (0x0018, 0x5100): ("CS", "1", "PatientPosition"),
    # --- group 0020 (relationship / image) ---
    (0x0020, 0x000D): ("UI", "1", "StudyInstanceUID"),
    (0x0020, 0x000E): ("UI", "1", "SeriesInstanceUID"),
    (0x0020, 0x0010): ("SH", "1", "StudyID"),
    (0x0020, 0x0011): ("IS", "1", "SeriesNumber"),
    (0x0020, 0x0013): ("IS", "1", "InstanceNumber"),
    (0x0020, 0x0020): ("CS", "2", "PatientOrientation"),
    (0x0020, 0x0032): ("DS", "3", "ImagePositionPatient"),
    (0x0020, 0x0037): ("DS", "6", "ImageOrientationPatient"),
    (0x0020, 0x1041): ("DS", "1", "SliceLocation"),
    (0x0020, 0x4000): ("LT", "1", "ImageComments"),
    # --- group 0028 (image pixel description) ---
    (0x0028, 0x0002): ("US", "1", "SamplesPerPixel"),
    (0x0028, 0x0004): ("CS", "1", "PhotometricInterpretation"),
    (0x0028, 0x0006): ("US", "1", "PlanarConfiguration"),
    (0x0028, 0x0008): ("IS", "1", "NumberOfFrames"),
    (0x0028, 0x0010): ("US", "1", "Rows"),
    (0x0028, 0x0011): ("US", "1", "Columns"),
    (0x0028, 0x0030): ("DS", "2", "PixelSpacing"),
    (0x0028, 0x0100): ("US", "1", "BitsAllocated"),
    (0x0028, 0x0101): ("US", "1", "BitsStored"),
    (0x0028, 0x0102): ("US", "1", "HighBit"),
    (0x0028, 0x0103): ("US", "1", "PixelRepresentation"),
    (0x0028, 0x1050): ("DS", "1-n", "WindowCenter"),
    (0x0028, 0x1051): ("DS", "1-n", "WindowWidth"),
    (0x0028, 0x1052): ("DS", "1", "RescaleIntercept"),
    (0x0028, 0x1053): ("DS", "1", "RescaleSlope"),
    # --- pixel data (parse stops here) ---
    (0x7FE0, 0x0010): ("OW", "1", "PixelData"),
}

_KEYWORD_INDEX: dict[str, tuple[int, int]] = {
    kw: tag for tag, (_vr, _vm, kw) in DICOM_DICT.items()
}

PIXEL_DATA_TAG = (0x7FE0, 0x0010)


def lookup(tag: tuple[int, int]) -> tuple[str, str, str] | None:
    """(VR, VM, keyword) for a tag, or None if unregistered."""
    return DICOM_DICT.get(tag)


def keyword_to_tag(keyword: str) -> tuple[int, int]:
    return _KEYWORD_INDEX[keyword]


def max_vm(vm: str) -> float:
    """Parse a PS3.6 VM string to its maximum multiplicity.

    '1' -> 1, '2' -> 2, '1-n' / '2-n' / '1-2' -> upper bound (inf for n).
    Mirrors the reference's VM parse (src/utils/tags.py:118-129).
    """
    parts = vm.split("-")
    if len(parts) == 1:
        return int(parts[0])
    upper = parts[1]
    return float("inf") if "n" in upper else int(upper)


def is_private(group: int) -> bool:
    """Private tags have odd group numbers (PS3.5 §7.8.1)."""
    return group % 2 == 1
