"""Column-level function families: multimodal payload decode/feature
extraction (the generic binary-column pattern proven by the DICOM path)."""

from .multimodal import (  # noqa: F401
    IMAGE_FEATURE_FIELDS,
    audio_features,
    frame_sample,
    image_features,
    resize_images,
    with_payload,
)
