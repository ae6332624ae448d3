"""DICOM VR -> value conversion, replicating the reference's *effective*
semantics (reference: src/utils/tags.py) including its quirks:

- Q1: the reference's vr_select dict literal repeats OB/OW/US/SS keys
  (src/utils/tags.py:224-254); Python keeps the last, so those VRs
  resolve to rep_string, and convert_OB / integer conversion are dead.
  We encode the post-duplicate-key mapping directly.
- Q2: present-but-empty DA -> 1900-01-01 (src/utils/tags.py:32); a
  *missing* partition tag is backfilled 1979-01-01 by the flattener
  (src/dicomwrapper.py:62) — that half lives in extract.py.
- Q3: a tag whose dictionary max-VM > 1 is always list-valued, even with
  a single value present (src/utils/tags.py:130-136).
- return_integer/return_float return rep_string (i.e. *strings*) when
  non-empty (src/utils/tags.py:166, :182) — fidelity means strings.
- unknown VR -> the reference crashes with TypeError
  (src/utils/tags.py:255 returns a message string, called at
  src/dicomwrapper.py:67); we raise, and ingest quarantines the record.
"""

from __future__ import annotations

import datetime

from .codec import Element, PersonName
from .dictionary import max_vm

EMPTY_DA_DEFAULT = datetime.date(1900, 1, 1)
MISSING_PARTITION_DEFAULT = datetime.date(1979, 1, 1)

PN_FIELDS = (
    "family_name", "given_name", "ideographic", "middle_name",
    "name_prefix", "name_suffix", "phonetic",
)


def _as_list(value: object) -> list:
    return list(value) if isinstance(value, list) else [value]


def rep_string(elem: Element) -> object:
    """validate_vm semantics (src/utils/tags.py:115-141): max VM > 1 ->
    list of raw values; else str(value)."""
    if max_vm(elem.vm) > 1:
        return _as_list(elem.value)
    v = elem.value
    if isinstance(v, list):  # defensively stringify unexpected multiplicity
        return [str(x) for x in v]
    return str(v)


def convert_DA(elem: Element) -> object:
    """DA -> datetime.date via %Y%m%d; empty -> 1900-01-01
    (src/utils/tags.py:18-35)."""
    if elem.is_empty:
        return EMPTY_DA_DEFAULT
    val = rep_string(elem)
    if isinstance(val, list):
        return [datetime.datetime.strptime(str(v), "%Y%m%d").date() for v in val]
    return datetime.datetime.strptime(str(val), "%Y%m%d").date()


def convert_TM(elem: Element) -> object:
    """TM stays a string — 'athena does not support TIME data type'
    (src/utils/tags.py:51-53); Spark likewise has no TIME type."""
    return rep_string(elem)


def convert_DT(elem: Element) -> object:
    """DT returned unparsed (all strptime lines are commented out in the
    reference, src/utils/tags.py:189-207)."""
    return elem.value if not isinstance(elem.value, PersonName) else str(elem.value)


def _pn_dict(pn: object) -> dict[str, str]:
    if isinstance(pn, PersonName):
        return {
            "family_name": pn.family_name, "given_name": pn.given_name,
            "ideographic": pn.ideographic, "middle_name": pn.middle_name,
            "name_prefix": pn.name_prefix, "name_suffix": pn.name_suffix,
            "phonetic": pn.phonetic,
        }
    p = PersonName.from_raw(str(pn))
    return _pn_dict(p)


def convert_PN(elem: Element) -> object:
    """PN -> 7-field dict; empty -> all-empty-string dict; multi-valued ->
    list of dicts (src/utils/tags.py:56-93)."""
    if elem.is_empty:
        return dict.fromkeys(PN_FIELDS, "")
    if isinstance(elem.value, list):
        return [_pn_dict(v) for v in elem.value]
    return _pn_dict(elem.value)


def return_integer(elem: Element) -> object:
    """AT/SL/UL: despite the name, non-empty values come back as strings
    via rep_string (src/utils/tags.py:162-169); 0 only when empty."""
    if not elem.is_empty:
        return rep_string(elem)
    return 0


def return_float(elem: Element) -> object:
    """FL: same string-when-present pattern (src/utils/tags.py:176-186)."""
    if not elem.is_empty:
        return rep_string(elem)
    return 0.0


def convert_SQ(elem: Element) -> object:
    """SQ -> one dict merging every item's keyword->converted-value,
    recursively (src/utils/tags.py:144-159). An empty item dataset makes
    the whole sequence None (src/utils/tags.py:151)."""
    if elem.is_empty:
        return ""
    sq: dict[str, object] = {}
    for item in elem.value:  # item: list[Element]
        if not item:
            return None
        for sub in item:
            if not sub.keyword:
                continue
            sq[sub.keyword] = convert(sub)
    return sq


# Effective (post-duplicate-key, Q1) dispatch table mirroring
# src/utils/tags.py:210-255.
_VR_DISPATCH = {
    "AE": rep_string, "AS": rep_string,
    "AT": return_integer,
    "CS": rep_string,
    "DA": convert_DA,
    "DS": rep_string,
    "DT": convert_DT,
    "FD": rep_string,
    "FL": return_float,
    "IS": rep_string,
    "LO": rep_string, "LT": rep_string,
    "OB": rep_string, "OD": rep_string, "OF": rep_string,
    "OL": rep_string, "OW": rep_string, "OV": rep_string,
    "PN": convert_PN,
    "SH": rep_string,
    "SL": return_integer,
    "SQ": convert_SQ,
    "SS": rep_string,  # Q1: duplicate key -> rep_string wins
    "ST": rep_string, "SV": rep_string,
    "TM": convert_TM,
    "UC": rep_string, "UI": rep_string,
    "UL": return_integer,
    "UN": rep_string, "UR": rep_string,
    "US": rep_string,  # Q1
    "UT": rep_string, "UV": rep_string,
}


def convert(elem: Element) -> object:
    """Dispatch one element through the VR table; unknown VR raises
    (the reference's call-site TypeError, src/dicomwrapper.py:67)."""
    fn = _VR_DISPATCH.get(elem.vr)
    if fn is None:
        raise ValueError(f"Invalid VR {elem.vr} tag {elem.tag}")
    return fn(elem)


def stringify(value: object) -> str:
    """Canonical string form for the extra_tags map<string,string>.

    Lists join with the DICOM multi-value delimiter '\\'; PN dicts use
    their raw '^'-composed form; dates ISO-format; SQ dicts render as
    'k=v;...' sorted by key for determinism.
    """
    if value is None:
        return ""
    if isinstance(value, list):
        return "\\".join(stringify(v) for v in value)
    if isinstance(value, dict):
        if set(value.keys()) == set(PN_FIELDS):
            comps = [value["family_name"], value["given_name"], value["middle_name"],
                     value["name_prefix"], value["name_suffix"]]
            alpha = "^".join(comps).rstrip("^")
            parts = [alpha]
            if value["ideographic"] or value["phonetic"]:
                parts += [value["ideographic"], value["phonetic"]]
            return "=".join(parts).rstrip("=")
        return ";".join(f"{k}={stringify(v)}" for k, v in sorted(value.items()))
    if isinstance(value, datetime.date):
        return value.isoformat()
    if isinstance(value, bytes):
        return "IGNORED"  # convert_OB default path (src/utils/tags.py:42-43)
    return str(value)
