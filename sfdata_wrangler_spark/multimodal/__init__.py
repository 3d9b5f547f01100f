from .binary_ops import (
    MULTIMODAL_SCHEMA,
    decode_images,
    extract_image_features,
    sample_video_frames,
)

__all__ = [
    "MULTIMODAL_SCHEMA",
    "decode_images",
    "extract_image_features",
    "sample_video_frames",
]
