"""Multimodal-column corpus: binary payload decode / feature extraction /
frame sampling via Arrow-batched mapInPandas (functions/multimodal.py).

The decoders are deterministic md5-derived stubs (real codecs aren't in
this container), which makes the *entire Python-worker path* — Arrow
batch transfer, schema projection, row expansion — value-checkable
against a DuckDB oracle replaying the same digest arithmetic in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.multimodal import frame_sample, image_features, with_payload
from .base import query, t

_N_DOCS = 100  # bounded slice: per-row feature outputs stay small


@query(
    "q61_image_features",
    oracle=f"""
    SELECT doc_id,
           CAST(CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 512 + 1 AS INTEGER) AS width,
           CAST(CAST('0x' || substr(md5(text), 5, 4) AS BIGINT) % 512 + 1 AS INTEGER) AS height,
           CAST(CAST('0x' || substr(md5(text), 9, 1) AS BIGINT) % 3 + 1 AS INTEGER) AS n_channels,
           CAST(CAST('0x' || substr(md5(text), 10, 4) AS BIGINT) % 256 AS DOUBLE) AS mean_intensity
    FROM documents WHERE doc_id < {_N_DOCS} ORDER BY doc_id
    """,
    category="multimodal",
)
def q61(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents").filter(F.col("doc_id") < _N_DOCS)
    feat = image_features(with_payload(docs.select("doc_id", "text")))
    return feat.select(
        "doc_id", "width", "height", "n_channels", "mean_intensity"
    ).orderBy("doc_id")


@query(
    "q62_frame_sample",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, md5(text) AS hx,
             CAST(CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 8 + 1 AS INTEGER) AS n_frames
      FROM documents WHERE doc_id < {_N_DOCS}
    )
    SELECT doc_id,
           CAST(f - 1 AS INTEGER) AS frame_idx,
           n_frames,
           md5(hx || '_' || CAST(f - 1 AS VARCHAR)) AS frame_digest
    FROM v CROSS JOIN generate_series(1, 8) AS gs(f)
    WHERE f <= n_frames
    ORDER BY doc_id, frame_idx
    """,
    category="multimodal",
)
def q62(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents").filter(F.col("doc_id") < _N_DOCS)
    frames = frame_sample(with_payload(docs.select("doc_id", "text")))
    return frames.select("doc_id", "frame_idx", "n_frames", "frame_digest").orderBy(
        "doc_id", "frame_idx"
    )


@query(
    "q63_modality_rollup",
    oracle=f"""
    WITH feat AS (
      SELECT source,
             CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 512 + 1 AS width,
             CAST('0x' || substr(md5(text), 5, 4) AS BIGINT) % 512 + 1 AS height
      FROM documents
    )
    SELECT source, COUNT(*) AS n,
           CAST(SUM(width * height) AS BIGINT) AS total_pixels,
           CAST(SUM(CASE WHEN width >= height THEN 1 ELSE 0 END) AS BIGINT) AS n_landscape
    FROM feat GROUP BY source ORDER BY source
    """,
    category="multimodal",
)
def q63(spark: SparkSession, sf: str) -> DataFrame:
    """Full-table decode + aggregate: the shape a corpus-wide media
    census runs at scale (decode is map-side; only the per-source
    partial aggregates shuffle)."""
    docs = t(spark, sf, "documents")
    feat = image_features(with_payload(docs.select("source", "text")))
    return (
        feat.groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("width").cast("long") * F.col("height")).alias("total_pixels"),
            F.sum(F.when(F.col("width") >= F.col("height"), 1).otherwise(0))
            .cast("long")
            .alias("n_landscape"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q111 — audio feature extraction through the same Arrow-batched
# mapInPandas path as q61 (stub decoder: sample rate from a 4-way hash
# pick, sample count, exact int/int duration division, 16-bit rms
# normalization). The oracle replays the digest arithmetic in SQL, so a
# hash match proves the Python-worker round-trip bit-exact.
# --------------------------------------------------------------------------


@query(
    "q111_audio_features",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, md5(text) AS hx FROM documents WHERE doc_id < {_N_DOCS}
    )
    SELECT doc_id,
           CAST(CASE CAST('0x' || substr(hx, 1, 1) AS BIGINT) % 4
                WHEN 0 THEN 8000 WHEN 1 THEN 16000
                WHEN 2 THEN 44100 ELSE 48000 END AS INTEGER) AS sample_rate,
           CAST(CAST('0x' || substr(hx, 2, 8) AS BIGINT) % 10000000 AS BIGINT)
             AS n_samples,
           CAST(CAST('0x' || substr(hx, 2, 8) AS BIGINT) % 10000000 AS DOUBLE)
             / (CASE CAST('0x' || substr(hx, 1, 1) AS BIGINT) % 4
                WHEN 0 THEN 8000 WHEN 1 THEN 16000
                WHEN 2 THEN 44100 ELSE 48000 END) AS duration_s,
           CAST(CAST('0x' || substr(hx, 10, 4) AS BIGINT) AS DOUBLE) / 65535.0 AS rms
    FROM h ORDER BY doc_id
    """,
    category="multimodal",
)
def q111(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.multimodal import audio_features

    docs = t(spark, sf, "documents").filter(F.col("doc_id") < _N_DOCS)
    feat = audio_features(with_payload(docs.select("doc_id", "text")))
    return feat.select(
        "doc_id", "sample_rate", "n_samples", "duration_s", "rms"
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# q112 — multimodal near-dup detection: perceptual-hash-style blocking
# over decoded image features. Candidates come from an equi-join on the
# coarse feature bucket (channels, width//128, height//128) — the pHash
# band analogue — and only candidates pay the intensity-distance check.
# Same blocking-first contract as the text dedup family, applied to the
# binary-column pipeline.
# --------------------------------------------------------------------------

_INTENSITY_EPS = 8.0

_Q112_FEAT = """
      SELECT doc_id,
             CAST(CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 512 + 1 AS INTEGER) AS width,
             CAST(CAST('0x' || substr(md5(text), 5, 4) AS BIGINT) % 512 + 1 AS INTEGER) AS height,
             CAST(CAST('0x' || substr(md5(text), 9, 1) AS BIGINT) % 3 + 1 AS INTEGER) AS n_channels,
             CAST(CAST('0x' || substr(md5(text), 10, 4) AS BIGINT) % 256 AS DOUBLE) AS mean_intensity
      FROM documents WHERE doc_id < {n}
"""


@query(
    "q112_multimodal_neardup",
    oracle=f"""
    WITH f AS ({_Q112_FEAT.format(n=_N_DOCS)})
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           abs(a.mean_intensity - b.mean_intensity) AS intensity_gap
    FROM f a JOIN f b
      ON a.n_channels = b.n_channels
     AND a.width // 128 = b.width // 128
     AND a.height // 128 = b.height // 128
     AND a.doc_id < b.doc_id
    WHERE abs(a.mean_intensity - b.mean_intensity) <= {_INTENSITY_EPS}
    ORDER BY d1, d2
    """,
    category="multimodal",
)
def q112(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents").filter(F.col("doc_id") < _N_DOCS)
    feat = image_features(with_payload(docs.select("doc_id", "text"))).select(
        "doc_id",
        "n_channels",
        F.expr("width div 128").alias("wb"),
        F.expr("height div 128").alias("hb"),
        "mean_intensity",
    )
    a = feat.alias("a")
    b = feat.alias("b")
    gap = F.abs(F.col("a.mean_intensity") - F.col("b.mean_intensity"))
    return (
        a.join(
            b,
            (F.col("a.n_channels") == F.col("b.n_channels"))
            & (F.col("a.wb") == F.col("b.wb"))
            & (F.col("a.hb") == F.col("b.hb"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(gap <= _INTENSITY_EPS)
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            gap.alias("intensity_gap"),
        )
        .orderBy("d1", "d2")
    )


# --------------------------------------------------------------------------
# q275 — shot-boundary (scene-cut) detection over sampled video frames:
# the standard frame-differencing operator of a video curation
# pipeline, run through the SAME Arrow-batched mapInPandas decode path
# as q62 — per-doc frame sampling stays in the Python worker, the
# luminance proxy and the lag-difference cut test stay JVM-side (a
# per-doc window over the bounded frame list, never a Python loop).
# The decoder is the deterministic md5 stub (real codecs aren't in
# this container), so the luminance is the digest's leading 16 bits
# mod 256 and the oracle replays the whole chain in SQL — a hash
# match certifies the decode -> feature -> window plumbing bit-exact.
# Cut rule: |lum - lag(lum)| >= 96 (hard-cut threshold on a 0..255
# scale).
#
# 100 TB shape: decode and frame expansion are map-side (mapInPandas,
# each task its own batch); the lag window partitions by doc over
# <= 8 frames per doc — bounded-width windows, corpus-scale parallel.
# Reference has no video path; this extends the multimodal family
# (q61/q62/q111/q112) the way a training-data pipeline needs.
# --------------------------------------------------------------------------

_CUT_THRESHOLD = 96


@query(
    "q275_scene_cuts",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, md5(text) AS hx,
             CAST(CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 8 + 1 AS INTEGER) AS n_frames
      FROM documents WHERE doc_id < {_N_DOCS}
    ),
    frames AS (
      SELECT doc_id,
             CAST(f - 1 AS INTEGER) AS frame_idx,
             CAST(CAST('0x' || substr(md5(hx || '_' || CAST(f - 1 AS VARCHAR)), 1, 4)
                       AS BIGINT) % 256 AS BIGINT) AS lum
      FROM v CROSS JOIN generate_series(1, 8) AS gs(f)
      WHERE f <= n_frames
    ),
    lagged AS (
      SELECT doc_id, frame_idx, lum,
             lag(lum) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev_lum
      FROM frames
    )
    SELECT doc_id, frame_idx, CAST(prev_lum AS BIGINT) AS prev_lum, lum,
           CAST(abs(lum - prev_lum) AS BIGINT) AS lum_delta
    FROM lagged
    WHERE prev_lum IS NOT NULL AND abs(lum - prev_lum) >= {_CUT_THRESHOLD}
    ORDER BY doc_id, frame_idx
    """,
    category="multimodal",
    doc="hard-cut detection: per-doc frame luminance lag-diff over the mapInPandas decode path",
)
def q275(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = t(spark, sf, "documents").filter(F.col("doc_id") < _N_DOCS)
    frames = frame_sample(with_payload(docs.select("doc_id", "text")))
    lum = frames.select(
        "doc_id",
        "frame_idx",
        F.expr(
            "CAST(conv(substr(frame_digest, 1, 4), 16, 10) AS BIGINT) % 256"
        ).alias("lum"),
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    lagged = lum.select(
        "doc_id", "frame_idx", "lum", F.lag("lum").over(w).alias("prev_lum")
    )
    return (
        lagged.filter(
            F.col("prev_lum").isNotNull()
            & (F.abs(F.col("lum") - F.col("prev_lum")) >= _CUT_THRESHOLD)
        )
        .select(
            "doc_id",
            "frame_idx",
            F.col("prev_lum").cast("long").alias("prev_lum"),
            "lum",
            F.abs(F.col("lum") - F.col("prev_lum")).cast("long").alias("lum_delta"),
        )
        .orderBy("doc_id", "frame_idx")
    )


# --------------------------------------------------------------------------
# q289 — silence-run segmentation over audio analysis windows: the
# voice-activity-style gate an audio curation pipeline runs before
# transcription (a clip that is mostly silence, or whose silence comes
# in one long run, is cut before the expensive ASR stage). Decode +
# window expansion ride the SAME Arrow-batched mapInPandas path as
# q62/q275 (deterministic md5 stub — the amplitude is the window
# digest's leading 16 bits mod 1024, silence is amp < 128 ≈ -18 dBFS
# of the stub's full scale); run detection is pure JVM gaps-and-
# islands: a run starts where a silent window follows a non-silent
# one, and run LENGTHS group by the classic win_idx - row_number() key
# over silent rows only. Docs with zero silent windows still emit
# (n_runs = longest_run = 0) via the left join back to the per-doc
# rollup.
#
# 100 TB shape: expansion is map-side and bounded (<= 16 windows/doc);
# every window function partitions by doc over those bounded frames;
# the only shuffles carry (doc_id, small ints). Reference has no audio
# path; this extends the multimodal family (q61/q62/q111/q112/q275).
# --------------------------------------------------------------------------

_SILENCE_AMP = 128  # amp < 128 of 0..1023 full scale


@query(
    "q289_silence_runs",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, md5(text) AS hx,
             CAST(CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 16 + 1 AS INTEGER) AS n_windows
      FROM documents WHERE doc_id < {_N_DOCS}
    ),
    wins AS (
      SELECT doc_id, n_windows,
             CAST(w - 1 AS INTEGER) AS win_idx,
             CAST(CAST('0x' || substr(md5(hx || '_a' || CAST(w - 1 AS VARCHAR)), 1, 4)
                       AS BIGINT) % 1024 AS BIGINT) AS amp
      FROM v CROSS JOIN generate_series(1, 16) AS gs(w)
      WHERE w <= n_windows
    ),
    sil AS (
      SELECT doc_id, win_idx,
             win_idx - row_number() OVER (PARTITION BY doc_id ORDER BY win_idx) AS grp
      FROM wins WHERE amp < {_SILENCE_AMP}
    ),
    runs AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS run_len
      FROM sil GROUP BY doc_id, grp
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(MAX(n_windows) AS BIGINT) AS n_windows,
             CAST(SUM(CASE WHEN amp < {_SILENCE_AMP} THEN 1 ELSE 0 END) AS BIGINT) AS n_silent
      FROM wins GROUP BY doc_id
    )
    SELECT p.doc_id, p.n_windows, p.n_silent,
           CAST(COALESCE(COUNT(r.run_len), 0) AS BIGINT) AS n_runs,
           CAST(COALESCE(MAX(r.run_len), 0) AS BIGINT) AS longest_run
    FROM per_doc p LEFT JOIN runs r ON p.doc_id = r.doc_id
    GROUP BY p.doc_id, p.n_windows, p.n_silent
    ORDER BY p.doc_id
    """,
    category="multimodal",
    doc="audio silence-run segmentation: stub-decoded window amplitudes, JVM gaps-and-islands run lengths per doc",
)
def q289(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.multimodal import waveform_windows

    docs = t(spark, sf, "documents").filter(F.col("doc_id") < _N_DOCS)
    wins = waveform_windows(with_payload(docs.select("doc_id", "text"))).select(
        "doc_id",
        "win_idx",
        "n_windows",
        F.expr(
            "CAST(conv(substr(win_digest, 1, 4), 16, 10) AS BIGINT) % 1024"
        ).alias("amp"),
    )
    sil = wins.filter(F.col("amp") < _SILENCE_AMP).select(
        "doc_id",
        "win_idx",
        (
            F.col("win_idx")
            - F.row_number().over(Window.partitionBy("doc_id").orderBy("win_idx"))
        ).alias("grp"),
    )
    runs = sil.groupBy("doc_id", "grp").agg(F.count("*").cast("long").alias("run_len"))
    per_doc = wins.groupBy("doc_id").agg(
        F.max("n_windows").cast("long").alias("n_windows"),
        F.sum(F.when(F.col("amp") < _SILENCE_AMP, 1).otherwise(0))
        .cast("long")
        .alias("n_silent"),
    )
    return (
        per_doc.join(runs, "doc_id", "left")
        .groupBy("doc_id", "n_windows", "n_silent")
        .agg(
            F.coalesce(F.count("run_len"), F.lit(0)).cast("long").alias("n_runs"),
            F.coalesce(F.max("run_len"), F.lit(0)).cast("long").alias("longest_run"),
        )
        .orderBy("doc_id")
    )
