"""Pure-Python image decoders (r10, carried r8 verdict #5).

The container ships no codec libraries, but uncompressed formats need
none: binary PPM (P6) / PGM (P5) and 24/8-bit uncompressed BMP decode
with stdlib + numpy. These are REAL decoders — header grammar, maxval
scaling, BMP bottom-up row order and 4-byte row padding — not fakes;
``binary_ops.decode_image_stub`` now dispatches here, and swapping in
PIL for JPEG/PNG later only widens the format table.

Everything returns ``DecodedImage(width, height, channels, plane)``
where ``plane`` is the row-major interleaved uint8 plane (RGB for
color, single channel for grayscale) as ``bytes`` — an exact, hashable
surface (the "hex plane") that SQL oracles can replay byte-for-byte
when the pixel source is known.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class DecodedImage:
    width: int
    height: int
    channels: int
    plane: bytes  # row-major, interleaved, uint8

    def array(self) -> np.ndarray:
        return np.frombuffer(self.plane, dtype=np.uint8).reshape(
            self.height, self.width, self.channels
        )


def _ppm_tokens(buf: bytes, n: int) -> tuple[list[int], int]:
    """Read n whitespace-separated ASCII integer tokens after the magic,
    skipping '#' comments (the netpbm header grammar). Returns (tokens,
    offset just past the single whitespace byte that terminates the
    last token — where the raster begins)."""
    toks: list[int] = []
    i = 2  # past magic
    cur = b""
    while len(toks) < n:
        if i >= len(buf):
            raise ValueError("ppm: truncated header")
        c = buf[i : i + 1]
        if c == b"#":
            # a comment terminates any in-progress token (netpbm treats
            # '#'..EOL as whitespace) — flush BEFORE skipping, or
            # "4#c\n4" would mis-parse as one token "44"
            if cur:
                toks.append(int(cur))
                cur = b""
            while i < len(buf) and buf[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c in (b" ", b"\t", b"\n", b"\r"):
            if cur:
                toks.append(int(cur))
                cur = b""
        elif c.isdigit():
            cur += c
        else:
            raise ValueError(f"ppm: bad header byte {c!r}")
        i += 1
    return toks, i


def decode_ppm(payload: bytes) -> DecodedImage:
    """Binary netpbm: P6 (RGB) and P5 (grayscale), maxval <= 255."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"ppm: unsupported magic {magic!r}")
    channels = 3 if magic == b"P6" else 1
    (width, height, maxval), off = _ppm_tokens(payload, 3)
    if width <= 0 or height <= 0:
        raise ValueError(f"ppm: bad dimensions {width}x{height}")
    if not 0 < maxval <= 255:
        raise ValueError(f"ppm: unsupported maxval {maxval} (8-bit only)")
    n = width * height * channels
    raster = payload[off : off + n]
    if len(raster) != n:
        raise ValueError(
            f"ppm: truncated raster ({len(raster)} of {n} bytes)"
        )
    if maxval != 255:
        arr = np.frombuffer(raster, dtype=np.uint8).astype(np.uint16)
        raster = ((arr * 255 + maxval // 2) // maxval).astype(
            np.uint8
        ).tobytes()
    return DecodedImage(width, height, channels, bytes(raster))


def decode_bmp(payload: bytes) -> DecodedImage:
    """Uncompressed BMP: BITMAPINFOHEADER, 24-bit BGR or 8-bit
    paletted, BI_RGB only. Handles bottom-up (positive height) and
    top-down (negative height) row order and 4-byte row padding.
    8-bit indices are mapped THROUGH the color table (BGRA entries
    after the info header) to an RGB plane — returning raw indices
    would be silently wrong for any non-identity palette."""
    if payload[:2] != b"BM":
        raise ValueError(f"bmp: bad magic {payload[:2]!r}")
    if len(payload) < 54:
        raise ValueError("bmp: truncated file header")
    pixel_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise ValueError(f"bmp: unsupported header size {hdr_size}")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0:
        raise ValueError(f"bmp: compression {compression} unsupported")
    if bpp not in (8, 24):
        raise ValueError(f"bmp: {bpp}bpp unsupported (8/24 only)")
    if width <= 0 or height == 0:
        raise ValueError(f"bmp: bad dimensions {width}x{height}")
    top_down = height < 0
    height = abs(height)
    bytes_per_px = 3 if bpp == 24 else 1
    row_bytes = width * bytes_per_px
    stride = (row_bytes + 3) & ~3  # rows pad to 4-byte boundaries
    need = pixel_off + stride * height
    if len(payload) < need:
        raise ValueError(
            f"bmp: truncated raster ({len(payload)} of {need} bytes)"
        )
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=pixel_off
    ).reshape(height, stride)[:, :row_bytes]
    if not top_down:
        rows = rows[::-1]  # bottom-up storage -> top-down plane
    if bpp == 24:
        # BGR on disk -> RGB plane
        rows = rows.reshape(height, width, 3)[:, :, ::-1]
        return DecodedImage(width, height, 3, rows.tobytes())
    # 8bpp: map indices through the BGRA color table to RGB
    n_colors = int.from_bytes(payload[46:50], "little") or 256
    pal_off = 14 + hdr_size
    pal_end = pal_off + 4 * n_colors
    if len(payload) < pal_end or pixel_off < pal_end:
        raise ValueError("bmp: truncated or overlapping color table")
    pal = np.frombuffer(
        payload, dtype=np.uint8, count=4 * n_colors, offset=pal_off
    ).reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRA -> RGB
    if rows.max(initial=0) >= n_colors:
        raise ValueError("bmp: pixel index outside the color table")
    rgb = pal[rows.reshape(height, width)]
    return DecodedImage(width, height, 3, rgb.tobytes())


_MAGIC_DECODERS = (
    ((b"P6", b"P5"), decode_ppm),
    ((b"BM",), decode_bmp),
)


def decode_image(payload: bytes) -> DecodedImage:
    """Dispatch on magic bytes. Raises ValueError for unsupported or
    malformed payloads — a decode failure must surface as a data error,
    never a wrong plane."""
    payload = bytes(payload)
    for magics, fn in _MAGIC_DECODERS:
        if payload[:2] in magics:
            return fn(payload)
    raise ValueError(
        f"decode_image: unsupported format (magic {payload[:2]!r}); "
        "supported: PPM/PGM (P6/P5), uncompressed BMP (8/24-bit)"
    )


def encode_ppm(width: int, height: int, plane: bytes) -> bytes:
    """Minimal P6/P5 writer for fixtures and round-trip tests."""
    n = width * height
    if len(plane) == 3 * n:
        magic = b"P6"
    elif len(plane) == n:
        magic = b"P5"
    else:
        raise ValueError("encode_ppm: plane size matches neither RGB nor gray")
    return magic + f"\n{width} {height}\n255\n".encode() + plane
