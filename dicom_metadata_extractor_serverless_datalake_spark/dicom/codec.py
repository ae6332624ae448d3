"""DICOM Part-10 reader/writer (metadata only), pure Python.

Implements the public file format: 128-byte preamble + ``DICM`` magic
(PS3.10 §7.1), File Meta group in explicit-VR little-endian, main dataset
in the transfer syntax named by (0002,0010) — explicit or implicit VR
little endian. Parsing stops at PixelData (7FE0,0010), the equivalent of
the reference's ``dcmread(stop_before_pixels=True)`` (src/app.py:75).

The writer exists to generate test fixtures (the role generate_dcm.py
plays in the reference) and always emits explicit VR little endian.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from .dictionary import DICOM_DICT, PIXEL_DATA_TAG, is_private, keyword_to_tag, lookup

MAGIC_OFFSET = 128
MAGIC = b"DICM"

IMPLICIT_VR_LE = "1.2.840.10008.1.2"
EXPLICIT_VR_LE = "1.2.840.10008.1.2.1"
EXPLICIT_VR_BE = "1.2.840.10008.1.2.2"

# VRs encoded with a 2-byte reserved field + 4-byte length (PS3.5 table 7.1-1)
_LONG_VRS = {"OB", "OW", "OF", "OD", "OL", "OV", "SQ", "UC", "UR", "UT", "UN", "SV", "UV"}
# string-typed VRs (decoded latin-1, backslash-delimited multi-value)
_STRING_VRS = {
    "AE", "AS", "CS", "DA", "DS", "DT", "IS", "LO", "LT", "PN",
    "SH", "ST", "TM", "UC", "UI", "UR", "UT",
}
_BINARY_FMT = {"US": "<H", "SS": "<h", "UL": "<I", "SL": "<i", "FL": "<f", "FD": "<d",
               "UV": "<Q", "SV": "<q"}

ITEM_TAG = (0xFFFE, 0xE000)
ITEM_DELIM_TAG = (0xFFFE, 0xE00D)
SEQ_DELIM_TAG = (0xFFFE, 0xE0DD)
UNDEFINED_LENGTH = 0xFFFFFFFF


class DicomParseError(ValueError):
    """Raised for structurally invalid DICOM input (missing magic,
    truncated element, unknown VR). The ingest layer routes these records
    to the quarantine sink — the Spark analogue of the reference's
    Lambda-retry -> SQS DLQ path (deploy/serverless.yml:188-190)."""


@dataclass
class PersonName:
    """Parsed PN value (PS3.5 §6.2.1): component groups split on '=',
    the alphabetic group's components split on '^'."""

    family_name: str = ""
    given_name: str = ""
    middle_name: str = ""
    name_prefix: str = ""
    name_suffix: str = ""
    ideographic: str = ""
    phonetic: str = ""
    raw: str = ""

    @classmethod
    def from_raw(cls, raw: str) -> "PersonName":
        groups = raw.split("=")
        comps = (groups[0].split("^") + [""] * 5)[:5]
        return cls(
            family_name=comps[0], given_name=comps[1], middle_name=comps[2],
            name_prefix=comps[3], name_suffix=comps[4],
            ideographic=groups[1] if len(groups) > 1 else "",
            phonetic=groups[2] if len(groups) > 2 else "",
            raw=raw,
        )

    def __str__(self) -> str:  # used when a PN lands in extra_tags
        return self.raw


@dataclass
class Element:
    """One decoded data element — the unit the VR layer dispatches on,
    mirroring the pydicom DataElement surface the reference consumes
    (src/dicomwrapper.py:40-47: .keyword / .is_empty / .VR / .value)."""

    tag: tuple[int, int]
    vr: str
    value: object
    keyword: str = ""
    vm: str = "1"

    @property
    def is_empty(self) -> bool:
        v = self.value
        if v is None:
            return True
        if isinstance(v, (str, bytes, list)) and len(v) == 0:
            return True
        return False


Dataset = list  # list[Element]


def _decode_string(vr: str, data: bytes) -> object:
    text = data.decode("latin-1", errors="replace")
    # trailing padding: space for most, NUL for UI (PS3.5 §6.2)
    text = text.rstrip("\x00").rstrip(" ") if vr != "UI" else text.rstrip("\x00")
    if vr in ("LT", "ST", "UT"):  # text VRs cannot be multi-valued
        values: list[object] = [text]
    else:
        values = list(text.split("\\")) if text else []
    if vr == "PN":
        values = [PersonName.from_raw(str(v)) for v in values]
    if not values or (len(values) == 1 and values[0] == ""):
        return None
    return values[0] if len(values) == 1 else values


def _decode_binary(vr: str, data: bytes) -> object:
    fmt = _BINARY_FMT[vr]
    size = struct.calcsize(fmt)
    if len(data) % size != 0:
        raise DicomParseError(f"bad length {len(data)} for VR {vr}")
    vals = [struct.unpack_from(fmt, data, i)[0] for i in range(0, len(data), size)]
    if not vals:
        return None
    return vals[0] if len(vals) == 1 else vals


def _decode_at(data: bytes) -> object:
    if len(data) % 4 != 0:
        raise DicomParseError(f"bad AT length {len(data)}")
    vals = []
    for i in range(0, len(data), 4):
        g, e = struct.unpack_from("<HH", data, i)
        vals.append(f"({g:04X},{e:04X})")
    if not vals:
        return None
    return vals[0] if len(vals) == 1 else vals


def _decode_value(vr: str, data: bytes) -> object:
    if vr in _STRING_VRS:
        return _decode_string(vr, data)
    if vr in _BINARY_FMT:
        return _decode_binary(vr, data)
    if vr == "AT":
        return _decode_at(data)
    # OB/OW/OF/OD/OL/OV/UN: opaque bytes
    return bytes(data)


def _read_tag(buf: memoryview, pos: int) -> tuple[int, int]:
    if pos + 4 > len(buf):
        raise DicomParseError("truncated tag")
    g, e = struct.unpack_from("<HH", buf, pos)
    return (g, e)


def _parse_elements(
    buf: memoryview,
    pos: int,
    end: int,
    explicit: bool,
    stop_before_pixels: bool,
    depth: int = 0,
) -> tuple[Dataset, int]:
    """Parse a dataset in ``buf[pos:end]``; returns (elements, next_pos)."""
    out: Dataset = []
    while pos < end:
        tag = _read_tag(buf, pos)
        if tag == ITEM_DELIM_TAG or tag == SEQ_DELIM_TAG:
            # consumed by the sequence caller
            return out, pos
        if stop_before_pixels and tag == PIXEL_DATA_TAG:
            return out, end
        pos += 4
        entry = lookup(tag)
        if explicit:
            if pos + 2 > len(buf):
                raise DicomParseError("truncated VR")
            vr = bytes(buf[pos : pos + 2]).decode("ascii", errors="replace")
            pos += 2
            if vr in _LONG_VRS:
                if pos + 6 > len(buf):
                    raise DicomParseError("truncated length")
                length = struct.unpack_from("<I", buf, pos + 2)[0]
                pos += 6
            else:
                if pos + 2 > len(buf):
                    raise DicomParseError("truncated length")
                length = struct.unpack_from("<H", buf, pos)[0]
                pos += 2
            if not vr.isalpha() or not vr.isupper():
                raise DicomParseError(f"invalid VR bytes {vr!r} at tag {tag}")
        else:
            vr = entry[0] if entry else "UN"
            if pos + 4 > len(buf):
                raise DicomParseError("truncated length")
            length = struct.unpack_from("<I", buf, pos)[0]
            pos += 4

        keyword = entry[2] if entry else ""
        vm = entry[1] if entry else "1"

        if vr == "SQ" or (length == UNDEFINED_LENGTH and vr in ("UN", "OB", "OW")):
            items, pos = _parse_sequence(buf, pos, length, explicit, stop_before_pixels, depth + 1)
            if not is_private(tag[0]):
                out.append(Element(tag=tag, vr="SQ", value=items, keyword=keyword, vm=vm))
            continue

        if length == UNDEFINED_LENGTH:
            raise DicomParseError(f"undefined length on non-SQ tag {tag} VR {vr}")
        if pos + length > len(buf):
            raise DicomParseError(f"element {tag} length {length} overruns buffer")
        raw = buf[pos : pos + length]
        pos += length
        if is_private(tag[0]):
            # remove_private_tags analogue (reference src/app.py:76)
            continue
        out.append(Element(tag=tag, vr=vr, value=_decode_value(vr, bytes(raw)), keyword=keyword, vm=vm))
    return out, pos


def _parse_sequence(
    buf: memoryview, pos: int, length: int, explicit: bool,
    stop_before_pixels: bool, depth: int,
) -> tuple[list[Dataset], int]:
    """Parse SQ items (PS3.5 §7.5). Returns (list of item datasets, next_pos)."""
    if depth > 16:
        raise DicomParseError("sequence nesting too deep")
    items: list[Dataset] = []
    end = len(buf) if length == UNDEFINED_LENGTH else pos + length
    while pos < end:
        tag = _read_tag(buf, pos)
        if tag == SEQ_DELIM_TAG:
            pos += 8  # tag + zero length
            return items, pos
        if tag != ITEM_TAG:
            raise DicomParseError(f"expected item tag in SQ, got {tag}")
        item_len = struct.unpack_from("<I", buf, pos + 4)[0]
        pos += 8
        if item_len == UNDEFINED_LENGTH:
            ds, pos = _parse_elements(buf, pos, end, explicit, stop_before_pixels, depth)
            # consume the item delimiter
            if _read_tag(buf, pos) != ITEM_DELIM_TAG:
                raise DicomParseError("missing item delimiter")
            pos += 8
        else:
            ds, _ = _parse_elements(buf, pos, pos + item_len, explicit, stop_before_pixels, depth)
            pos += item_len
        items.append(ds)
    return items, pos


def is_dicom(data: bytes) -> bool:
    """DICM magic check at offset 128 — mirrors the reference's
    check_dcm (src/utils/utils.py:51-58)."""
    return len(data) >= MAGIC_OFFSET + 4 and data[MAGIC_OFFSET : MAGIC_OFFSET + 4] == MAGIC


def parse_dicom(data: bytes, stop_before_pixels: bool = True) -> Dataset:
    """Parse a Part-10 file's metadata into a flat list of Elements
    (file-meta elements excluded, matching pydicom's dcmread default view
    the reference iterates in src/dicomwrapper.py:40)."""
    if not is_dicom(data):
        raise DicomParseError("missing DICM magic at offset 128")
    buf = memoryview(data)
    pos = MAGIC_OFFSET + 4

    # file meta group: always explicit VR LE; group length bounds it
    meta, pos = _parse_file_meta(buf, pos)
    transfer_syntax = EXPLICIT_VR_LE
    for el in meta:
        if el.tag == (0x0002, 0x0010) and isinstance(el.value, str):
            transfer_syntax = el.value
    if transfer_syntax == EXPLICIT_VR_BE:
        raise DicomParseError("explicit VR big endian is retired and unsupported")
    explicit = transfer_syntax != IMPLICIT_VR_LE

    ds, _ = _parse_elements(buf, pos, len(buf), explicit, stop_before_pixels)
    return ds


def _parse_file_meta(buf: memoryview, pos: int) -> tuple[Dataset, int]:
    out: Dataset = []
    # first element must be (0002,0000) UL group length
    tag = _read_tag(buf, pos)
    if tag != (0x0002, 0x0000):
        # tolerate absent group length: parse while group == 0002
        end = len(buf)
        while pos < end and _read_tag(buf, pos)[0] == 0x0002:
            els, pos = _parse_elements(buf, pos, pos + _peek_len(buf, pos), True, True)
            out.extend(els)
        return out, pos
    vr = bytes(buf[pos + 4 : pos + 6]).decode("ascii")
    if vr != "UL":
        raise DicomParseError("file meta group length must be UL")
    group_len = struct.unpack_from("<I", buf, pos + 8)[0]
    pos += 12
    meta_end = pos + group_len
    out, pos = _parse_elements(buf, pos, meta_end, True, True)
    return out, meta_end


def _peek_len(buf: memoryview, pos: int) -> int:
    vr = bytes(buf[pos + 4 : pos + 6]).decode("ascii", errors="replace")
    if vr in _LONG_VRS:
        return 12 + struct.unpack_from("<I", buf, pos + 8)[0]
    return 8 + struct.unpack_from("<H", buf, pos + 6)[0]


# --------------------------------------------------------------------------
# Writer (fixture generation — the generate_dcm.py role)
# --------------------------------------------------------------------------

def _encode_string(vr: str, value: object) -> bytes:
    if isinstance(value, (list, tuple)):
        text = "\\".join(str(v) for v in value)
    else:
        text = str(value)
    data = text.encode("latin-1")
    if len(data) % 2:
        data += b"\x00" if vr == "UI" else b" "
    return data


def _encode_value(vr: str, value: object) -> bytes:
    if value is None:
        return b""
    if vr in _STRING_VRS:
        return _encode_string(vr, value)
    if vr in _BINARY_FMT:
        vals = value if isinstance(value, (list, tuple)) else [value]
        return b"".join(struct.pack(_BINARY_FMT[vr], v) for v in vals)
    if isinstance(value, bytes):
        return value + (b"\x00" if len(value) % 2 else b"")
    raise ValueError(f"cannot encode VR {vr} value {value!r}")


def _encode_element(tag: tuple[int, int], vr: str, payload: bytes) -> bytes:
    head = struct.pack("<HH", *tag) + vr.encode("ascii")
    if vr in _LONG_VRS:
        return head + b"\x00\x00" + struct.pack("<I", len(payload)) + payload
    return head + struct.pack("<H", len(payload)) + payload


def _encode_sq(tag: tuple[int, int], items: list[dict]) -> bytes:
    body = b""
    for item in items:
        item_payload = b"".join(
            _encode_keyword_value(kw, v) for kw, v in sorted(item.items(), key=lambda kv: keyword_to_tag(kv[0]))
        )
        body += struct.pack("<HHI", *ITEM_TAG, len(item_payload)) + item_payload
    return _encode_element(tag, "SQ", body)


def _encode_keyword_value(keyword: str, value: object) -> bytes:
    tag = keyword_to_tag(keyword)
    vr = DICOM_DICT[tag][0]
    if vr == "SQ":
        return _encode_sq(tag, value)  # type: ignore[arg-type]
    return _encode_element(tag, vr, _encode_value(vr, value))


def write_dicom(
    tags: dict[str, object],
    pixel_data: bytes | None = None,
    sop_instance_uid: str = "1.2.826.0.1.3680043.8.498.1",
) -> bytes:
    """Serialize keyword->value tags to an explicit-VR-LE Part-10 file.

    ``tags`` keys are dictionary keywords; values are scalars, lists
    (multi-value), or for SQ a list of item dicts. Private/unknown
    keywords are rejected. Used to build test fixtures equivalent to the
    reference's sample_dcm/ set.
    """
    meta_elems = (
        _encode_element((0x0002, 0x0001), "OB", b"\x00\x01")
        + _encode_element((0x0002, 0x0002), "UI", _encode_string("UI", "1.2.840.10008.5.1.4.1.1.7"))
        + _encode_element((0x0002, 0x0003), "UI", _encode_string("UI", sop_instance_uid))
        + _encode_element((0x0002, 0x0010), "UI", _encode_string("UI", EXPLICIT_VR_LE))
    )
    meta = _encode_element((0x0002, 0x0000), "UL", struct.pack("<I", len(meta_elems))) + meta_elems

    body = b"".join(
        _encode_keyword_value(kw, v)
        for kw, v in sorted(tags.items(), key=lambda kv: keyword_to_tag(kv[0]))
    )
    if pixel_data is not None:
        body += _encode_element(PIXEL_DATA_TAG, "OW", pixel_data + (b"\x00" if len(pixel_data) % 2 else b""))

    return b"\x00" * MAGIC_OFFSET + MAGIC + meta + body
