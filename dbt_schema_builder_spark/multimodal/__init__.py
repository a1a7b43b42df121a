from .binary_ops import (
    attach_fake_image_bytes,
    audio_features,
    decode_image_stub,
    frame_dedup,
    image_features,
    resize_images,
    sample_frames,
)

__all__ = [
    "attach_fake_image_bytes",
    "audio_features",
    "decode_image_stub",
    "frame_dedup",
    "image_features",
    "resize_images",
    "sample_frames",
]
