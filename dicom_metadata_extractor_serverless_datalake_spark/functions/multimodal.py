"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, decoded executor-side via Arrow-batched mapInPandas.

This generalizes the reference's DICOM pattern — binary object in,
typed metadata row out (src/dicomwrapper.py:36-64) — to arbitrary media.
The Spark-side plumbing (schema, partitioning, UDF signature, Arrow
batch shape) is real and tested; the *codec* itself is pluggable:

- if a real decoder library (PIL / soundfile / av) is importable it is
  used;
- otherwise a clearly-marked DETERMINISTIC STUB derives pseudo-features
  from the md5 digest of the payload bytes. The stub is bit-reproducible
  across engines (md5 is portable), which lets the correctness harness
  value-check the whole mapInPandas path end-to-end instead of settling
  for a rows-only check.

At 100 TB the decode stage is the pipeline's CPU hot spot; everything
here is shaped for that:
- one mapInPandas pass, no per-row Python UDF dispatch;
- features are computed per Arrow batch with the payload column held as
  a pandas Series of bytes (zero-copy from Arrow);
- row-expanding ops (frame sampling) emit their multiplier inside the
  same pass, so no join-back is needed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_FEATURE_FIELDS = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)

AUDIO_FEATURE_FIELDS = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def with_payload(df: DataFrame, text_col: str = "text", payload_col: str = "content") -> DataFrame:
    """Attach a binary payload column (UTF-8 bytes of ``text_col``) — the
    testdata has no real media, so documents stand in as opaque blobs."""
    return df.withColumn(payload_col, F.encode(F.col(text_col), "UTF-8"))


def _try_real_image_decoder():
    try:  # pragma: no cover - PIL absent in this environment
        from PIL import Image  # noqa: F401

        return Image
    except Exception:
        return None


def _stub_image_features(payload: bytes) -> tuple[int, int, int, float]:
    """DETERMINISTIC STUB decoder: pseudo width/height/channels/intensity
    from the md5 hex digest of the payload. Replace with a real codec
    (PIL) in production; the digest arithmetic is mirrored by the SQL
    oracle so the Arrow/mapInPandas plumbing is value-checked."""
    hx = hashlib.md5(payload).hexdigest()
    width = int(hx[0:4], 16) % 512 + 1
    height = int(hx[4:8], 16) % 512 + 1
    n_channels = int(hx[8], 16) % 3 + 1
    mean_intensity = float(int(hx[9:13], 16) % 256)
    return width, height, n_channels, mean_intensity


def image_features(df: DataFrame, payload_col: str = "content") -> DataFrame:
    """Append image feature columns decoded from a binary payload column.

    Output schema = input columns + IMAGE_FEATURE_FIELDS. Decode runs in
    mapInPandas (one Python worker pass per Arrow batch)."""
    real = _try_real_image_decoder()
    schema = T.StructType(list(df.schema.fields) + list(IMAGE_FEATURE_FIELDS.fields))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_one_image(real, bytes(b)) if b is not None else (None, None, None, None)
                for b in pdf[payload_col]
            ]
            out = pdf.copy()
            out["width"], out["height"], out["n_channels"], out["mean_intensity"] = zip(
                *feats
            ) if feats else ([], [], [], [])
            yield out

    return df.mapInPandas(decode, schema=schema)


def _decode_one_image(real, payload: bytes):
    if real is not None:  # pragma: no cover - real codec path
        import io

        import numpy as np

        img = real.open(io.BytesIO(payload))
        arr = np.asarray(img)
        ch = 1 if arr.ndim == 2 else arr.shape[2]
        return img.width, img.height, ch, float(arr.mean())
    return _stub_image_features(payload)


def _stub_audio_features(payload: bytes) -> tuple[int, int, float, float]:
    hx = hashlib.md5(payload).hexdigest()
    sample_rate = (8000, 16000, 44100, 48000)[int(hx[0], 16) % 4]
    n_samples = int(hx[1:9], 16) % 10_000_000
    duration_s = n_samples / sample_rate
    rms = float(int(hx[9:13], 16)) / 65535.0
    return sample_rate, n_samples, duration_s, rms


def audio_features(df: DataFrame, payload_col: str = "content") -> DataFrame:
    """Append audio feature columns (stub decoder; real path would use
    soundfile/librosa — not present in this container)."""
    schema = T.StructType(list(df.schema.fields) + list(AUDIO_FEATURE_FIELDS.fields))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _stub_audio_features(bytes(b)) if b is not None else (None, None, None, None)
                for b in pdf[payload_col]
            ]
            out = pdf.copy()
            out["sample_rate"], out["n_samples"], out["duration_s"], out["rms"] = zip(
                *feats
            ) if feats else ([], [], [], [])
            yield out

    return df.mapInPandas(decode, schema=schema)


RESIZED_FIELDS = T.StructType(
    [
        T.StructField("resized", T.BinaryType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    target_width: int = 224,
    target_height: int = 224,
    payload_col: str = "content",
) -> DataFrame:
    """Append a resized payload column (the preprocessing step before a
    vision encoder). Real path would decode + resample via PIL; the stub
    emits a deterministic surrogate payload (md5 digest bytes repeated to
    a size proportional to the target area) so batch shape, binary
    output typing, and memory profile are exercised for real."""
    real = _try_real_image_decoder()
    schema = T.StructType(list(df.schema.fields) + list(RESIZED_FIELDS.fields))
    surrogate_len = max(16, (target_width * target_height) // 1024)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for b in pdf[payload_col]:
                if b is None:
                    outs.append((None, None, None))
                    continue
                payload = bytes(b)
                if real is not None:  # pragma: no cover - real codec path
                    import io

                    img = real.open(io.BytesIO(payload)).resize(
                        (target_width, target_height)
                    )
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    outs.append((buf.getvalue(), target_width, target_height))
                else:
                    digest = hashlib.md5(payload).digest()
                    reps = surrogate_len // len(digest) + 1
                    outs.append(
                        ((digest * reps)[:surrogate_len], target_width, target_height)
                    )
            out = pdf.copy()
            out["resized"], out["out_width"], out["out_height"] = (
                zip(*outs) if outs else ([], [], [])
            )
            yield out

    return df.mapInPandas(resize, schema=schema)


def frame_sample(
    df: DataFrame,
    payload_col: str = "content",
    id_cols: tuple[str, ...] = ("doc_id",),
    max_frames: int = 8,
) -> DataFrame:
    """Video frame sampling as a row-expanding mapInPandas: each payload
    yields ``1 + digest % max_frames`` frame rows with a per-frame digest
    (stub for keyframe extraction via av/ffmpeg). One pass, no join-back;
    at scale the expansion multiplier stays bounded by ``max_frames``."""
    schema = T.StructType(
        [f for f in df.schema.fields if f.name in id_cols]
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("frame_digest", T.StringType()),
        ]
    )

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                payload = rec[payload_col]
                if payload is None:
                    continue
                payload = bytes(payload)
                hx = hashlib.md5(payload).hexdigest()
                n_frames = int(hx[0:4], 16) % max_frames + 1
                for i in range(n_frames):
                    rows.append(
                        {
                            **{c: rec[c] for c in id_cols},
                            "frame_idx": i,
                            "n_frames": n_frames,
                            # digest chained off the payload digest + index —
                            # string-domain so the SQL oracle can replay it
                            "frame_digest": hashlib.md5(
                                f"{hx}_{i}".encode()
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(expand, schema=schema)


def waveform_windows(
    df: DataFrame,
    payload_col: str = "content",
    id_cols: tuple[str, ...] = ("doc_id",),
    max_windows: int = 16,
) -> DataFrame:
    """Audio analysis-window expansion as a row-expanding mapInPandas:
    each payload yields ``1 + digest % max_windows`` window rows with a
    per-window digest (stub for fixed-hop RMS framing via soundfile —
    real codecs aren't in this container). Same contract as
    :func:`frame_sample`: one pass, no join-back, expansion bounded by
    ``max_windows``; the digest chain is string-domain so a SQL oracle
    replays the whole decode -> window chain bit-exact."""
    schema = T.StructType(
        [f for f in df.schema.fields if f.name in id_cols]
        + [
            T.StructField("win_idx", T.IntegerType()),
            T.StructField("n_windows", T.IntegerType()),
            T.StructField("win_digest", T.StringType()),
        ]
    )

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                payload = rec[payload_col]
                if payload is None:
                    continue
                payload = bytes(payload)
                hx = hashlib.md5(payload).hexdigest()
                n_windows = int(hx[0:4], 16) % max_windows + 1
                for i in range(n_windows):
                    rows.append(
                        {
                            **{c: rec[c] for c in id_cols},
                            "win_idx": i,
                            "n_windows": n_windows,
                            "win_digest": hashlib.md5(
                                f"{hx}_a{i}".encode()
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(expand, schema=schema)
