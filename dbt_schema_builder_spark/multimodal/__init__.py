from .binary_ops import (
    attach_fake_image_bytes,
    attach_ppm_image_bytes,
    audio_features,
    decode_image_stub,
    decoded_image_features,
    frame_dedup,
    image_features,
    resize_images,
    sample_frames,
)
from .codecs import decode_bmp, decode_image, decode_ppm, encode_ppm

__all__ = [
    "attach_fake_image_bytes",
    "attach_ppm_image_bytes",
    "audio_features",
    "decode_bmp",
    "decode_image",
    "decode_image_stub",
    "decoded_image_features",
    "encode_ppm",
    "frame_dedup",
    "image_features",
    "resize_images",
    "sample_frames",
]
