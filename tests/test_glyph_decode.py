"""Glyph codec + decode-chain tests (SURVEY §5.1, FIXTURES.md cases)."""

import numpy as np
import pytest

from pgstosrt_ray import format as F
from pgstosrt_ray import glyph
from pgstosrt_ray.decode import (decode_display_set, decode_object_indexed,
                                 non_transparent_extents, _pad_canvas,
                                 rgba_of)


def decode_object_raw(rle, width, height, lut):
    idx, written = decode_object_indexed(rle, width, height)
    return rgba_of(idx, written, lut)
from pgstosrt_ray.fixtures import DEFAULT_PALETTE


def _lut():
    buf = F.encode_pds_payload(0, 0, DEFAULT_PALETTE)[2:]
    return F.build_palette_lut([buf])


def _rgba_of(text, scale=1):
    bm = glyph.render_text(text, scale=scale)
    return _pad_canvas(decode_object_raw(F.rle_encode(bm), bm.shape[1],
                                         bm.shape[0], _lut()))


@pytest.mark.parametrize("text", [
    "Hello, world!", "a", "  spaces  ", "multi\nline\ntext",
    "punct: ,.;!?\"'()", "Ünïcödé çhårs — ok», ≤0xFFFF",
])
def test_roundtrip(text):
    assert glyph.ocr_bitmap(_rgba_of(text)) == text


@pytest.mark.parametrize("scale", [1, 2, 3, 5, 8])
def test_roundtrip_scales(scale):
    assert glyph.ocr_bitmap(_rgba_of("scaled text", scale)) == "scaled text"


def test_empty_canvas_decodes_empty():
    assert glyph.ocr_bitmap(np.zeros((60, 60, 4), np.uint8)) == ""


def test_extents():
    img = _rgba_of("wide", scale=2)
    nt_h, nt_w = non_transparent_extents(img)
    assert nt_h == 32                       # 16 rows * scale 2
    assert nt_w == (len("wide") + 2) * 2    # chars + 2 markers
    assert img.shape[0] == 32 + 50          # +50 canvas pad


def test_transparent_pixels_skipped():
    # color index 2 with alpha 0 must not render (PutPixel :149-155)
    pal = [(1, 235, 128, 128, 255), (2, 110, 90, 240, 0)]
    buf = F.encode_pds_payload(0, 0, pal)[2:]
    lut = F.build_palette_lut([buf])
    bm = np.full((4, 4), 2, np.uint8)
    img = decode_object_raw(F.rle_encode(bm), 4, 4, lut)
    assert img[:, :, 3].max() == 0
