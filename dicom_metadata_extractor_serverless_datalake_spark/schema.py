"""Canonical lake schema for the dicom_metadata table.

The reference writes a *dynamic* per-object schema (union of non-empty
keywords, src/dicomwrapper.py:40-47, all-null columns dropped at
src/app.py:41) and separately declares a fixed 15-column Glue table
(deploy/serverless.yml:537-567) that a crawler widens over time. That
split is the source of its two documented schema-drift failure classes
(README.md:149-151, :180-188).

The engine replaces it with one pinned wide StructType: the Glue-declared
columns typed per the reference's effective semantics (SURVEY §1.3), a
struct for PN, arrays for VM>1 tags, plus an ``extra_tags``
map<string,string> overflow for every other extracted keyword — so no
crawler, no mergeSchema, no drift, and Parquet readers always see one
stable schema (critical at 100 TB: schema merging across millions of
files is a driver-side metadata explosion).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

PN_STRUCT = T.StructType(
    [
        T.StructField("family_name", T.StringType()),
        T.StructField("given_name", T.StringType()),
        T.StructField("ideographic", T.StringType()),
        T.StructField("middle_name", T.StringType()),
        T.StructField("name_prefix", T.StringType()),
        T.StructField("name_suffix", T.StringType()),
        T.StructField("phonetic", T.StringType()),
    ]
)

# Glue DDL columns (deploy/serverless.yml:537-567) + engine additions
# (patient_name struct, image_type, extra_tags) + partition key.
DICOM_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("sopclass_uid", T.StringType()),
        T.StructField("sop_instance_uid", T.StringType()),
        T.StructField("study_time", T.StringType()),
        T.StructField("study_id", T.StringType()),
        T.StructField("series_number", T.StringType()),  # IS -> string (src/utils/tags.py:162-169)
        T.StructField("patient_sex", T.StringType()),
        T.StructField("patient_birth_date", T.DateType()),
        T.StructField("patient_age", T.StringType()),
        T.StructField("patient_orientation", T.ArrayType(T.StringType())),  # VM=2
        T.StructField("patient_weight", T.StringType()),  # DS -> string
        T.StructField("image_comments", T.StringType()),
        T.StructField("patient_name", PN_STRUCT),
        T.StructField("image_type", T.ArrayType(T.StringType())),  # VM=2-n
        T.StructField("extra_tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("source_s3_bucket", T.StringType()),
        T.StructField("source_s3_region", T.StringType()),
        T.StructField("source_s3_key", T.StringType()),
        T.StructField("source_s3_archive_path", T.StringType()),
        T.StructField("study_date", T.DateType()),  # partition key
    ]
)

# structured quarantine breadcrumb — the engine-side counterpart of the
# reference's structlog JSON event (src/logger.py:1-47: timestamped,
# named, exc-info-carrying records on every ingest failure). A log LINE
# is unqueryable from a lakehouse; the same facts as a typed struct on
# the quarantine sink make the DLQ itself the debugging surface:
# ``WHERE error_log.stage = 'archive_explode'`` instead of grepping
# driver stderr across a 1000-executor run.
QUARANTINE_LOG_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.StringType()),        # pipeline step that failed
        T.StructField("error_class", T.StringType()),  # exception class name
        T.StructField("source_key", T.StringType()),   # object key
        T.StructField("member_path", T.StringType()),  # archive member, if any
        T.StructField("ts", T.TimestampType()),        # worker-side wall clock
    ]
)

# ingest output = lake schema + error channel; rows with a non-null
# ``error`` column route to the quarantine sink (the DLQ analogue,
# deploy/serverless.yml:123-147), carrying the structured breadcrumb.
INGEST_SCHEMA = T.StructType(
    list(DICOM_METADATA_SCHEMA.fields)
    + [
        T.StructField("error", T.StringType()),
        T.StructField("error_log", QUARANTINE_LOG_SCHEMA),
    ]
)

PARTITION_COL = "study_date"

# keyword -> canonical column for the declared (non-extra) columns.
# Mapping follows the reference's sanitize step (src/app.py:50) that
# produced the Glue names: underscore inserted only before an uppercase
# letter preceded by a lowercase/digit, then lowercased — which is why
# SOPClassUID -> sopclass_uid (deploy/serverless.yml:539-541).
_SNAKE_RE = re.compile(r"(?<=[a-z0-9])([A-Z])")


def to_column_name(keyword: str) -> str:
    """CamelCase DICOM keyword -> snake_case column name (Q4 round-trip,
    src/dicomwrapper.py:69-73 + awswrangler sanitize at src/app.py:50)."""
    return _SNAKE_RE.sub(r"_\1", keyword).lower()


def to_camel_case(name: str) -> str:
    """snake_case -> CamelCase (convert_cc, src/dicomwrapper.py:69-73)."""
    return "".join(x.capitalize() for x in name.split("_"))


CANONICAL_KEYWORDS: dict[str, str] = {
    "Modality": "modality",
    "SOPClassUID": "sopclass_uid",
    "SOPInstanceUID": "sop_instance_uid",
    "StudyTime": "study_time",
    "StudyID": "study_id",
    "SeriesNumber": "series_number",
    "PatientSex": "patient_sex",
    "PatientBirthDate": "patient_birth_date",
    "PatientAge": "patient_age",
    "PatientOrientation": "patient_orientation",
    "PatientWeight": "patient_weight",
    "ImageComments": "image_comments",
    "PatientName": "patient_name",
    "ImageType": "image_type",
    "StudyDate": "study_date",
}
