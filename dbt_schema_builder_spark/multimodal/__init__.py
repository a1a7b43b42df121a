from .binary_ops import (
    attach_fake_image_bytes,
    decode_image_stub,
    image_features,
    sample_frames,
)

__all__ = [
    "attach_fake_image_bytes",
    "decode_image_stub",
    "image_features",
    "sample_frames",
]
