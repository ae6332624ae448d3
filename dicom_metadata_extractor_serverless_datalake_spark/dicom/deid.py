"""De-identification of the dicom_metadata lake table.

The reference stores extracted metadata verbatim — PatientName,
PatientID, birth dates, free-text comments and whatever private/extra
tags survive pruning land in the lake as-is (src/dicomwrapper.py:40-47
keeps every non-empty keyword; only *private* tags are dropped,
src/dicomwrapper.py:30-33). Any lake that is shared for research needs
the pass this module implements; the rules follow the DICOM PS3.15
Basic Confidentiality Profile / HIPAA Safe Harbor shape:

- **Pseudonymize, don't drop, identifiers that carry referential
  structure** (UIDs, StudyID, AccessionNumber, PatientID): each value
  maps through a salted SHA-256 to a stable token, so joins/groupBys by
  patient, study or series still work on the de-identified frame and
  two exports with the same salt are linkable, while exports with
  different salts are not.
- **Shift dates per patient, preserving intra-patient intervals**: a
  deterministic per-patient offset in [-shift, +shift] days derived
  from the salted patient identity is added to every date column —
  follow-up gaps and longitudinal ordering survive, absolute dates do
  not. The partition key stays a valid date, so partition pruning and
  the 1979-01-01 backfill convention keep working.
- **Generalize quasi-identifiers**: birth date floors to January 1st
  of its year (Safe Harbor keeps the year), ages 90+ coarsen to the
  "090Y+" aggregate bucket.
- **Null direct identifiers and free text**: every PN component except
  the pseudonym, ImageComments, and any configured free-text column.
- **Default-deny the extra_tags map**: a free-form map is where PHI
  hides; only an explicit allowlist of technical acquisition keys
  survives, with UID-valued keys pseudonymized through the same hash
  (so extra_tags['StudyInstanceUID'] still matches across rows).
- **Pseudonymize source paths**: object keys/archive paths frequently
  embed patient names or MRNs; bucket and region (infrastructure, not
  PHI) are kept.

Everything is a single map-side projection of built-in column
expressions (sha2 / date_add / map_filter / transform_values): no UDF,
no shuffle, no driver round-trip — at 100 TB the pass costs one scan
and rewrites in parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# extra_tags keys that may survive de-identification (technical /
# acquisition attributes — no patient identity). UID-valued keys are
# listed separately: they survive but pseudonymized.
SAFE_EXTRA_TAGS = frozenset(
    {
        "Manufacturer",
        "ManufacturerModelName",
        "SoftwareVersions",
        "MagneticFieldStrength",
        "SliceThickness",
        "SpacingBetweenSlices",
        "PixelSpacing",
        "Rows",
        "Columns",
        "BitsAllocated",
        "BitsStored",
        "HighBit",
        "PixelRepresentation",
        "PhotometricInterpretation",
        "SamplesPerPixel",
        "NumberOfFrames",
        "BodyPartExamined",
        "ViewPosition",
        "Laterality",
        "KVP",
        "ExposureTime",
        "XRayTubeCurrent",
        "RepetitionTime",
        "EchoTime",
        "FlipAngle",
        "InstanceNumber",
        "AcquisitionNumber",
        "ProtocolName",
        "TransferSyntaxUID",  # encoding, not identity
    }
)

UID_EXTRA_TAGS = frozenset(
    {
        "StudyInstanceUID",
        "SeriesInstanceUID",
        "FrameOfReferenceUID",
        "MediaStorageSOPInstanceUID",
        "AccessionNumber",
        "PatientID",
    }
)


def _pseudo(col: Column, salt: str) -> Column:
    """Salted, truncated SHA-256 pseudonym; NULL stays NULL."""
    return F.when(
        col.isNotNull(), F.substring(F.sha2(F.concat(F.lit(salt), col), 256), 1, 32)
    )


def _patient_identity() -> Column:
    """Best patient identity available on the pinned schema: the
    PatientID extra tag when present, else the concatenated PN
    components (the same precedence a PACS uses for matching). NULL
    when the row carries no identity at all."""
    pid = F.element_at(F.col("extra_tags"), F.lit("PatientID"))
    # positional concat (NOT concat_ws, which skips NULL components and
    # would collide family='Doe',given='John' with family='Doe',
    # middle='John' into one identity)
    pn = F.concat(
        F.coalesce(F.col("patient_name.family_name"), F.lit("")),
        F.lit("^"),
        F.coalesce(F.col("patient_name.given_name"), F.lit("")),
        F.lit("^"),
        F.coalesce(F.col("patient_name.middle_name"), F.lit("")),
    )
    return F.coalesce(pid, F.nullif(pn, F.lit("^^")))


def _day_shift(identity: Column, salt: str, max_days: int) -> Column:
    """Deterministic per-patient day offset in [-max_days, +max_days],
    derived from the salted identity (NOT from the row), so every row
    of one patient shifts identically and intervals survive."""
    h = F.conv(
        F.substring(F.sha2(F.concat(F.lit(salt + "|shift|"), identity), 256), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(2 * max_days + 1)) - F.lit(max_days)


def _age_years(col: Column) -> Column:
    """Years encoded in a DICOM AS value; tolerant of non-padded
    real-world values ('90Y', '102Y'), NULL for non-year units."""
    return F.when(
        col.rlike(r"^\d{1,3}Y$"),
        F.regexp_extract(col, r"^(\d{1,3})Y$", 1).cast("int"),
    )


def _is_90_plus(age_col: Column, birth: Column, study: Column) -> Column:
    """Safe Harbor's 90+ test from EITHER signal: the AS age, or the
    birth-to-study year gap (a 90+ patient whose age tag is absent
    still must not disclose a birth year)."""
    by_age = _age_years(age_col) >= 90
    by_dates = (F.year(study) - F.year(birth)) >= 90
    return F.coalesce(by_age, F.lit(False)) | F.coalesce(by_dates, F.lit(False))


def deidentify(
    df: DataFrame,
    salt: str,
    date_shift_max_days: int = 30,
    free_text_cols: tuple[str, ...] = ("image_comments",),
    keep_study_time: bool = True,
) -> DataFrame:
    """De-identify a dicom_metadata frame (lake schema, schema.py).

    One-way: apply exactly once per export; re-applying hashes the
    pseudonyms again (harmless but pointless). Same ``salt`` -> same
    pseudonyms and date shifts (two exports are linkable); a fresh
    salt severs linkage. Output schema == input schema.
    """
    identity = _patient_identity()
    # rows with no identity at all share one shift bucket ('<unknown>')
    # — their intervals still survive, and no identity leaks either way
    shift = _day_shift(F.coalesce(identity, F.lit("<unknown>")), salt, date_shift_max_days)

    safe_keys = sorted(SAFE_EXTRA_TAGS | UID_EXTRA_TAGS)
    uid_keys = sorted(UID_EXTRA_TAGS)

    out = (
        df
        # stable patient pseudonym carried in family_name; all other PN
        # components null (struct shape preserved for the pinned schema)
        .withColumn(
            "patient_name",
            F.when(
                identity.isNotNull(),
                F.struct(
                    F.concat(F.lit("anon-"), F.substring(
                        F.sha2(F.concat(F.lit(salt), identity), 256), 1, 16
                    )).alias("family_name"),
                    *(F.lit(None).cast("string").alias(c) for c in (
                        "given_name", "ideographic", "middle_name",
                        "name_prefix", "name_suffix", "phonetic",
                    )),
                ),
            ),
        )
        .withColumn("sop_instance_uid", _pseudo(F.col("sop_instance_uid"), salt))
        .withColumn("study_id", _pseudo(F.col("study_id"), salt))
        # 90+ decided from ORIGINAL age/birth/study values (before any
        # shift), carried through the projection as a temp column
        .withColumn(
            "_90plus",
            _is_90_plus(
                F.col("patient_age"), F.col("patient_birth_date"), F.col("study_date")
            ),
        )
        # per-patient interval-preserving date shift; partition key
        # stays a real date. The 1979-01-01 missing-StudyDate backfill
        # sentinel (ingest/extract.py) is NOT shifted: it encodes "date
        # unknown", discloses nothing, and shifting it would scatter
        # sentinel rows into real 1978/79 partitions.
        .withColumn(
            "study_date",
            F.when(
                F.col("study_date") == F.lit("1979-01-01").cast("date"),
                F.col("study_date"),
            ).otherwise(F.date_add(F.col("study_date"), shift.cast("int"))),
        )
        # birth date -> year floor (Safe Harbor keeps the year only);
        # for 90+ patients the year itself is the age disclosure, so it
        # nulls out entirely
        .withColumn(
            "patient_birth_date",
            F.when(
                ~F.col("_90plus"),
                F.to_date(F.concat(F.year("patient_birth_date"), F.lit("-01-01"))),
            ),
        )
        .withColumn(
            "patient_age",
            F.when(F.col("_90plus"), F.lit("090Y+")).otherwise(F.col("patient_age")),
        )
        # default-deny extra_tags: allowlist survives, UID keys through
        # the same pseudonym hash as the UID columns (python lambda API
        # so the salt never enters a SQL string)
        .withColumn(
            "extra_tags",
            F.transform_values(
                F.map_filter(F.col("extra_tags"), lambda k, v: k.isin(safe_keys)),
                lambda k, v: F.when(k.isin(uid_keys), _pseudo(v, salt)).otherwise(v),
            ),
        )
        # object keys/paths can embed names or MRNs
        .withColumn("source_s3_key", _pseudo(F.col("source_s3_key"), salt))
        .withColumn(
            "source_s3_archive_path", _pseudo(F.col("source_s3_archive_path"), salt)
        )
    )
    for c in free_text_cols:
        out = out.withColumn(c, F.lit(None).cast("string"))
    if not keep_study_time:
        out = out.withColumn("study_time", F.lit(None).cast("string"))
    return out.select(*df.columns)
