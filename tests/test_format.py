"""Unit tests for the byte-level codec layer (SURVEY §5.1)."""

import numpy as np
import pytest

from pgstosrt_ray import format as F


def _decode_to_array(rle: bytes, width: int, height: int) -> np.ndarray:
    out = np.zeros(width * height, np.uint8)
    for pos, idx, ln in F.rle_decode_runs(rle, width):
        out[pos:pos + ln] = idx
    return out.reshape(height, width)


class TestRle:
    def test_roundtrip_simple(self):
        bm = np.array([[0, 0, 1, 1, 0], [2, 2, 2, 2, 2]], dtype=np.uint8)
        assert np.array_equal(_decode_to_array(F.rle_encode(bm), 5, 2), bm)

    def test_long_zero_run(self):
        bm = np.zeros((1, 500), np.uint8)
        bm[0, 499] = 7
        rle = F.rle_encode(bm)
        assert rle[:3] == bytes((0x00, 0x40 | (499 >> 8), 499 & 0xFF))
        assert np.array_equal(_decode_to_array(rle, 500, 1), bm)

    def test_long_color_run(self):
        bm = np.full((1, 300), 9, np.uint8)
        rle = F.rle_encode(bm)
        assert rle[:4] == bytes((0x00, 0xC0 | (300 >> 8), 300 & 0xFF, 9))
        assert np.array_equal(_decode_to_array(rle, 300, 1), bm)

    def test_short_runs_and_literals(self):
        bm = np.array([[5, 0, 0, 0, 6, 6, 6, 0]], dtype=np.uint8)
        rle = F.rle_encode(bm)
        assert rle[0] == 5                      # literal
        assert np.array_equal(_decode_to_array(rle, 8, 1), bm)

    def test_every_width_roundtrip(self):
        rng = np.random.RandomState(3)
        for w in (1, 2, 63, 64, 65, 200):
            bm = rng.randint(0, 4, size=(5, w)).astype(np.uint8)
            assert np.array_equal(_decode_to_array(F.rle_encode(bm), w, 5), bm)

    def test_end_of_line_snap(self):
        # a short row write followed by 0x00 0x00 must snap to next row
        buf = bytes((3, 0x00, 0x00, 4))  # pixel 3, EOL, pixel 4
        out = _decode_to_array(buf, 4, 2)
        assert out[0, 0] == 3 and out[1, 0] == 4


class TestHeaders:
    def test_sup_header_roundtrip(self):
        seg = F.encode_sup_segment(F.SEG_PCS, 123456, b"abc")
        assert seg[:2] == b"PG"
        assert F.be32(seg, 2) == 123456
        assert seg[10] == F.SEG_PCS
        assert F.be16(seg, 11) == 3

    def test_mkv_header_roundtrip(self):
        seg = F.encode_mkv_segment(F.SEG_END, b"")
        assert seg[0] == F.SEG_END and F.be16(seg, 1) == 0

    def test_composition_state(self):
        assert F.composition_state_from_byte(0x00) == F.STATE_NORMAL
        assert F.composition_state_from_byte(0x40) == F.STATE_ACQU_POINT
        assert F.composition_state_from_byte(0x80) == F.STATE_EPOCH_START
        assert F.composition_state_from_byte(0xC0) == F.STATE_EPOCH_CONTINUE
        assert F.composition_state_from_byte(0x13) == F.STATE_INVALID


class TestPalette:
    def test_basic_lut(self):
        buf = F.encode_pds_payload(0, 0, [(1, 235, 128, 128, 255)])[2:]
        lut = F.build_palette_lut([buf])
        assert lut[1, 3] == 255
        assert lut[1, 0] > 230  # near-white
        assert lut[0, 3] == 0   # untouched entries stay transparent

    def test_last_version_wins(self):
        v0 = F.encode_pds_payload(0, 0, [(1, 50, 128, 128, 255)])[2:]
        v1 = F.encode_pds_payload(0, 1, [(1, 235, 128, 128, 255)])[2:]
        lut = F.build_palette_lut([v0, v1])
        assert lut[1, 0] > 200  # v1's bright Y, not v0's dark one

    def test_alpha_clamp_below_14(self):
        buf = F.encode_pds_payload(0, 0, [(1, 235, 128, 128, 5)])[2:]
        lut = F.build_palette_lut([buf])
        # alpha<14 forces transparent-black color but keeps the alpha
        assert lut[1, 3] == 5
        assert lut[1, 0] == 0 and lut[1, 1] == 0 and lut[1, 2] == 0

    def test_alpha_merge_keeps_max(self):
        # duplicate index in one buffer: lower alpha later must not win
        buf = F.encode_pds_payload(0, 0, [(1, 235, 128, 128, 200),
                                          (1, 100, 128, 128, 50)])[2:]
        lut = F.build_palette_lut([buf])
        assert lut[1, 3] == 200


class TestBigEndian:
    def test_be16_be32(self):
        assert F.be16(b"\x01\x02", 0) == 0x0102
        assert F.be32(b"\x01\x02\x03\x04", 0) == 0x01020304
        assert F.pack_be16(0x0102) == b"\x01\x02"
        assert F.pack_be32(0x01020304) == b"\x01\x02\x03\x04"
