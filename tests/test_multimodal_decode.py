"""Stdlib image decode (operators/multimodal.py): PPM round-trip, BMP
parse, injectable-seam precedence, and the no-setup default."""

from __future__ import annotations

import struct

import pytest

from qa_data_pipeline_rag_llm_spark.operators.multimodal import (
    _PPM_H,
    _PPM_W,
    decode_image,
    default_decode,
    render_ppm,
)


def test_ppm_render_decode_roundtrip():
    img = decode_image(render_ppm("hello world"))
    assert (img["width"], img["height"], img["maxval"]) == (_PPM_W, _PPM_H, 255)
    px = img["pixels"]
    assert len(px) == _PPM_W * _PPM_H * 3
    cps = [ord(c) % 256 for c in "hello world"]
    assert list(px) == [cps[i % len(cps)] for i in range(len(px))]


def test_ppm_empty_text_is_black():
    img = decode_image(render_ppm(""))
    assert set(img["pixels"]) == {0}


def test_p3_ascii_ppm_decodes():
    p3 = b"P3\n# comment\n2 1\n255\n10 20 30  40 50 60\n"
    img = decode_image(p3)
    assert (img["width"], img["height"]) == (2, 1)
    assert list(img["pixels"]) == [10, 20, 30, 40, 50, 60]


def _tiny_bmp(w, h, rgb_rows):
    """Build a 24bpp bottom-up BMP from top-down RGB row tuples."""
    stride = (w * 3 + 3) & ~3
    body = b""
    for row in reversed(rgb_rows):  # file stores bottom-up
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)  # BGR
        body += line + b"\x00" * (stride - len(line))
    off = 54
    header = b"BM" + struct.pack(
        "<IHHI", off + len(body), 0, 0, off
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return header + body


def test_bmp_24bpp_decodes_topdown_rgb():
    rows = [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (10, 11, 12)]]
    img = decode_image(_tiny_bmp(2, 2, rows))
    assert (img["width"], img["height"]) == (2, 2)
    assert list(img["pixels"]) == list(range(1, 13))


def test_unknown_magic_raises_with_seam_hint():
    with pytest.raises(ValueError, match="inject decoder="):
        default_decode(b"\x89PNG....")


def test_injected_decoder_wins():
    marker = object()
    assert decode_image(b"P6 anything", decoder=lambda b: marker) is marker


def test_patch_grid_degenerate_dims_emit_zero_patches(spark):
    """width/height of 0 (corrupt media) must produce NO patches —
    sequence(0, -1) yields a DESCENDING [0, -1] and the pre-r03 shape
    emitted phantom patches with negative offsets (review r03)."""
    from pyspark.sql import functions as F

    from qa_data_pipeline_rag_llm_spark.operators.multimodal import patch_grid

    blobs = spark.createDataFrame(
        [(1, 0, 240), (2, 320, 0), (3, 320, 240)],
        "doc_id long, w int, h int",
    ).select(
        "doc_id", F.struct(F.col("w").alias("width"), F.col("h").alias("height")).alias("meta")
    )
    got = patch_grid(blobs).collect()
    assert {r["doc_id"] for r in got} == {3}
    assert all(r["x_off"] >= 0 and r["y_off"] >= 0 for r in got)
    assert all(r["pw"] > 0 and r["ph"] > 0 for r in got)
