"""r10 (carried r8 verdict #5): the decode seam is REAL now — pure-
Python PPM/PGM/BMP decoders with known-pixel fixtures, format-grammar
edge cases (BMP row padding, bottom-up storage, maxval scaling, header
comments), loud failures for unsupported payloads, and the Spark-side
synthesized-PPM pipeline whose decoded plane an ANSI oracle replays
byte-for-byte (the hex-plane pattern)."""

import hashlib

import numpy as np
import pytest

from dbt_schema_builder_spark.multimodal import (
    attach_ppm_image_bytes,
    decode_bmp,
    decode_image,
    decode_image_stub,
    decoded_image_features,
    decode_ppm,
    encode_ppm,
)


# ---------------------------------------------------------------------------
# codec unit tests — hand-built fixtures with known pixel values
# ---------------------------------------------------------------------------


def test_ppm_p6_known_pixels_roundtrip():
    plane = bytes(range(2 * 2 * 3))  # 2x2 RGB, pixels 0..11
    img = decode_ppm(encode_ppm(2, 2, plane))
    assert (img.width, img.height, img.channels) == (2, 2, 3)
    assert img.plane == plane
    arr = img.array()
    assert arr.shape == (2, 2, 3)
    assert tuple(arr[0, 0]) == (0, 1, 2)  # top-left pixel RGB
    assert tuple(arr[1, 1]) == (9, 10, 11)  # bottom-right


def test_pgm_p5_grayscale():
    plane = bytes([0, 128, 255, 7])
    img = decode_ppm(encode_ppm(2, 2, plane))
    assert (img.width, img.height, img.channels) == (2, 2, 1)
    assert img.plane == plane


def test_ppm_header_comments_and_maxval_scaling():
    # netpbm headers may carry '#' comments anywhere in the whitespace;
    # maxval 100 scales to 255 with half-away integer rounding
    raw = b"P5\n# a comment\n2 1 # dims\n100\n" + bytes([0, 50])
    img = decode_ppm(raw)
    assert img.width == 2 and img.height == 1
    # 50/100 -> (50*255 + 50)//100 = 128
    assert img.plane == bytes([0, 128])


def _bmp24(width, height, pixels_rgb, top_down=False):
    """Hand-assemble an uncompressed 24-bit BMP. pixels_rgb is row-major
    top-down [(r,g,b), ...]."""
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    rows = []
    for y in range(height):
        row = b"".join(
            bytes([b, g, r])  # BGR on disk
            for (r, g, b) in pixels_rgb[y * width : (y + 1) * width]
        )
        rows.append(row + b"\x00" * (stride - row_bytes))
    if not top_down:
        rows = rows[::-1]  # bottom-up storage
    raster = b"".join(rows)
    pixel_off = 14 + 40
    h = height if top_down is False else -height
    header = (
        b"BM"
        + (pixel_off + len(raster)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + pixel_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + len(raster).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + raster


BMP_PIXELS = [
    (255, 0, 0), (0, 255, 0), (0, 0, 255),  # row 0: R G B
    (1, 2, 3), (4, 5, 6), (7, 8, 9),        # row 1
]


def test_bmp_24bit_bottom_up_with_padding():
    # width 3 -> 9-byte rows padded to 12: the stride path is exercised
    img = decode_bmp(_bmp24(3, 2, BMP_PIXELS))
    assert (img.width, img.height, img.channels) == (3, 2, 3)
    arr = img.array()
    assert tuple(arr[0, 0]) == (255, 0, 0)  # top-left is RED (BGR+flip)
    assert tuple(arr[0, 2]) == (0, 0, 255)
    assert tuple(arr[1, 1]) == (4, 5, 6)


def test_bmp_top_down_negative_height():
    img = decode_bmp(_bmp24(3, 2, BMP_PIXELS, top_down=True))
    assert tuple(img.array()[0, 0]) == (255, 0, 0)
    # same logical image either storage order
    assert img.plane == decode_bmp(_bmp24(3, 2, BMP_PIXELS)).plane


def test_decoders_fail_loudly_on_bad_payloads():
    with pytest.raises(ValueError, match="magic"):
        decode_ppm(b"P3\n1 1\n255\n0 0 0")  # ASCII ppm unsupported
    with pytest.raises(ValueError, match="truncated raster"):
        decode_ppm(b"P6\n2 2\n255\n" + b"\x00" * 5)
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00")
    with pytest.raises(ValueError, match="compression"):
        bad = bytearray(_bmp24(1, 1, [(0, 0, 0)]))
        bad[30] = 1  # BI_RLE8
        decode_bmp(bytes(bad))
    with pytest.raises(ValueError, match="unsupported format"):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    # the historical seam dispatches for real and raises the same
    # ValueError (never NotImplementedError) for unsupported formats
    with pytest.raises(ValueError, match="unsupported format"):
        decode_image_stub(b"\xff\xd8\xff\xe0jpeg?")
    got = decode_image_stub(encode_ppm(2, 2, bytes(range(12))))
    assert got.plane == bytes(range(12))


def test_decode_image_dispatches_on_magic():
    ppm = decode_image(encode_ppm(1, 1, b"\x01\x02\x03"))
    bmp = decode_image(_bmp24(1, 1, [(1, 2, 3)]))
    assert ppm.plane == bmp.plane == b"\x01\x02\x03"


# ---------------------------------------------------------------------------
# Spark pipeline: synthesize real PPMs, REALLY decode them, oracle-match
# ---------------------------------------------------------------------------


def _expected_plane_hex(text: str) -> str:
    return (
        hashlib.md5(text.encode()).hexdigest()
        + hashlib.md5(f"{text}:p1".encode()).hexdigest()
        + hashlib.md5(f"{text}:p2".encode()).hexdigest()
    )


def test_decoded_image_features_matches_md5_plane(spark, tables):
    docs = tables["documents"].limit(64)
    texts = {r.doc_id: r.text for r in docs.collect()}
    out = {
        r.doc_id: r
        for r in decoded_image_features(attach_ppm_image_bytes(docs)).collect()
    }
    assert set(out) == set(texts)
    for doc_id, r in out.items():
        hexplane = _expected_plane_hex(texts[doc_id])
        assert (r.width, r.height, r.channels) == (4, 4, 3)
        assert r.plane_hex == hexplane  # parser reproduced every byte
        plane = bytes.fromhex(hexplane)
        arr = np.frombuffer(plane, dtype=np.uint8).reshape(-1, 3)
        assert (r.sum_r, r.sum_g, r.sum_b) == tuple(
            int(s) for s in arr.sum(axis=0, dtype=np.int64)
        )


def test_decoded_image_features_inline_duckdb_oracle(spark, tables):
    """The hex-plane oracle: DuckDB re-derives the synthesized pixels
    from the TEXT (never parsing PPM) and must match the REAL parser's
    output exactly — dims, int64 channel sums, full plane hex."""
    import duckdb
    import pandas as pd

    docs = tables["documents"].limit(64)
    got = {
        tuple(r)
        for r in decoded_image_features(
            attach_ppm_image_bytes(docs)
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": [r.doc_id for r in docs.collect()],
                "text": [r.text for r in docs.collect()],
            }
        ),
    )
    chan_sum = (
        "CAST(list_sum(list_transform(list_filter(range(48), "
        "i -> i % 3 = {c}), i -> CAST(('0x' || substr(hexplane, "
        "i * 2 + 1, 2)) AS BIGINT))) AS BIGINT)"
    )
    want = {
        tuple(r)
        for r in con.execute(
            "WITH p AS (SELECT doc_id, md5(text) || "
            "md5(text || ':p1') || md5(text || ':p2') AS hexplane "
            "FROM documents) "
            "SELECT doc_id, 4 AS width, 4 AS height, 3 AS channels, "
            f"{chan_sum.format(c=0)} AS sum_r, "
            f"{chan_sum.format(c=1)} AS sum_g, "
            f"{chan_sum.format(c=2)} AS sum_b, "
            "hexplane AS plane_hex FROM p"
        ).fetchall()
    }
    assert got == want


def test_ppm_comment_terminates_token():
    # review fix: a '#' directly after digits must flush the token —
    # "4#c\n 4" is dims (4, 4), never one token "44"
    raw = b"P5\n4#c\n 4\n255\n" + bytes(16)
    img = decode_ppm(raw)
    assert (img.width, img.height) == (4, 4)


def _bmp8(width, height, indices, palette_rgb):
    """Hand-assemble an 8-bit paletted BMP (bottom-up)."""
    stride = (width + 3) & ~3
    rows = []
    for y in range(height):
        row = bytes(indices[y * width : (y + 1) * width])
        rows.append(row + b"\x00" * (stride - width))
    raster = b"".join(rows[::-1])
    n_colors = len(palette_rgb)
    pal = b"".join(bytes([b, g, r, 0]) for (r, g, b) in palette_rgb)
    pixel_off = 14 + 40 + len(pal)
    header = (
        b"BM"
        + (pixel_off + len(raster)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + pixel_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (8).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raster).to_bytes(4, "little")
        + b"\x00" * 8
        + n_colors.to_bytes(4, "little")  # biClrUsed
        + b"\x00" * 4
    )
    return header + pal + raster


def test_bmp_8bit_maps_through_palette():
    # review fix: raw indices are NOT pixel values — a non-identity
    # palette must be applied (index 0 -> red, 1 -> white)
    pal = [(255, 0, 0), (255, 255, 255)]
    img = decode_bmp(_bmp8(2, 2, [0, 1, 1, 0], pal))
    assert (img.width, img.height, img.channels) == (2, 2, 3)
    arr = img.array()
    assert tuple(arr[0, 0]) == (255, 0, 0)
    assert tuple(arr[0, 1]) == (255, 255, 255)
    assert tuple(arr[1, 1]) == (255, 0, 0)
    # an index beyond the declared table is a loud data error
    with pytest.raises(ValueError, match="color table"):
        decode_bmp(_bmp8(1, 1, [5], pal))
