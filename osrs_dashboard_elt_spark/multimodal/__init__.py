"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched pandas over ``mapInPandas``."""

from .media import (
    MEDIA_FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    attach_fake_media,
    decode_image,
    extract_media_features,
    resize_images,
    sample_frames,
)

__all__ = [
    "MEDIA_FEATURE_SCHEMA",
    "MEDIA_SCHEMA",
    "attach_fake_media",
    "decode_image",
    "extract_media_features",
    "resize_images",
    "sample_frames",
]
