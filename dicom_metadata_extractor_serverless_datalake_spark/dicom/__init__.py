"""Pure-Python DICOM metadata codec.

pydicom is not available in this environment, so the engine carries a
minimal reader/writer for the public DICOM file format (NEMA PS3.10 file
structure, PS3.5 encoding/VRs, PS3.6 data dictionary). Only metadata is
decoded — the reader stops before PixelData, the analogue of the
reference's ``pydicom.dcmread(stop_before_pixels=True)``
(reference: src/app.py:75).
"""

from .codec import DicomParseError, Element, parse_dicom, write_dicom  # noqa: F401
from .dictionary import DICOM_DICT, keyword_to_tag, lookup  # noqa: F401
