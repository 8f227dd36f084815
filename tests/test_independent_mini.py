"""Independent mini re-implementations of the RLE opcode walk and the
D2 merge decision table, written directly from the reference citations
(BluRaySupParserExtensions.cs:55-134, BluRaySupParserImageSharp.cs:
424-558) WITHOUT importing the repo's decode/merge kernels' logic.

The repo's oracle and Ray pipeline deliberately share one kernel
(byte-identity by construction), which makes a shared-kernel bug
invisible to golden-file agreement — these tests break that loop: a
mutation in format.rle_decode_runs / decode.decode_object_indexed /
merge.merge_cue_runs (e.g. flipping the <10-tick gap) is caught here
against an implementation with no shared code.
"""

import random
from dataclasses import dataclass, field

import numpy as np
import pytest

from pgstosrt_ray import fixtures as FX
from pgstosrt_ray import format as F
from pgstosrt_ray.decode import DecodeMeta, decode_object_indexed
from pgstosrt_ray.merge import CueView, merge_cue_runs
from pgstosrt_ray.parse import parse_payload


# ---------------------------------------------------------------------------
# Mini RLE decoder: literal per-pixel transcription of DecodeImage's
# do/while walk (BluRaySupParserExtensions.cs:55-134), writing palette
# indices. num1 = output cursor, num2 = pixels in current line,
# num3 = input cursor — same names as the decompiled reference.

def mini_rle_decode(buf: bytes, width: int, height: int):
    n = width * height
    idx = np.zeros(n, dtype=np.uint8)
    written = np.zeros(n, dtype=bool)

    def put(pos, value):
        if 0 <= pos < n:          # C# would throw on overflow; fixtures
            idx[pos] = value      # never overflow (asserted separately)
            written[pos] = True

    num1 = num2 = num3 = 0
    if len(buf) == 0:
        return idx.reshape(height, width), written.reshape(height, width)
    while True:
        color1 = buf[num3]
        num3 += 1
        if color1 == 0 and num3 < len(buf):
            num4 = buf[num3]
            num3 += 1
            if num4 == 0:
                num1 = num1 // width * width
                if num2 < width:
                    num1 += width
                num2 = 0
            elif (num4 & 192) == 64:
                if num3 < len(buf):
                    num5 = ((num4 - 64) << 8) + buf[num3]
                    num3 += 1
                    for _ in range(num5):
                        put(num1, 0)
                        num1 += 1
                    num2 += num5
            elif (num4 & 192) == 128:
                if num3 < len(buf):
                    num6 = num4 - 128
                    index1 = buf[num3]
                    num3 += 1
                    for _ in range(num6):
                        put(num1, index1)
                        num1 += 1
                    num2 += num6
            elif (num4 & 192) != 0:
                if num3 < len(buf):
                    num10 = ((num4 - 192) << 8) + buf[num3]
                    index5 = buf[num3 + 1]
                    num3 += 2
                    for _ in range(num10):
                        put(num1, index5)
                        num1 += 1
                    num2 += num10
            else:
                for _ in range(num4):
                    put(num1, 0)
                    num1 += 1
                num2 += num4
        else:
            put(num1, color1)
            num1 += 1
            num2 += 1
        if num3 >= len(buf):
            break
    return idx.reshape(height, width), written.reshape(height, width)


def _assert_same_decode(buf: bytes, width: int, height: int):
    mini_idx, mini_written = mini_rle_decode(buf, width, height)
    got_idx, got_written = decode_object_indexed(buf, width, height)
    assert np.array_equal(got_idx, mini_idx)
    if got_written is None:
        # contiguous fast path: written == prefix of pixels covered
        got_written = np.zeros(width * height, dtype=bool)
        got_written[:int(mini_written.sum())] = True
        got_written = got_written.reshape(height, width)
    assert np.array_equal(got_written, mini_written)


class TestMiniRleAgainstKernel:
    def test_roundtrip_bitmaps(self):
        rng = np.random.RandomState(3)
        for _ in range(20):
            h, w = rng.randint(2, 40), rng.randint(2, 90)
            img = (rng.rand(h, w) < 0.4).astype(np.uint8) * rng.randint(1, 5)
            buf = F.rle_encode(img)
            _assert_same_decode(buf, w, h)
            mini_idx, _ = mini_rle_decode(buf, w, h)
            assert np.array_equal(mini_idx, img)  # encoder round-trip too

    def test_handcrafted_opcodes(self):
        w, h = 8, 4
        cases = [
            # short transparent run + literal + EOL
            bytes((0x00, 0x03, 0x05, 0x00, 0x00)),
            # 0x80 colored run spanning to EOL
            bytes((0x00, 0x80 | 8, 0x02, 0x00, 0x00)),
            # 0x40 long transparent run (2 lines worth)
            bytes((0x00, 0x40, 0x10, 0x00, 0x00)),
            # 0xC0 long colored run
            bytes((0x00, 0xC0, 0x0A, 0x07, 0x00, 0x00)),
            # partial line then EOL snap (col < width)
            bytes((0x01, 0x02, 0x00, 0x00, 0x03, 0x00, 0x00)),
            # full line then EOL (col == width: no extra row skip)
            F.rle_encode(np.arange(8, dtype=np.uint8).reshape(1, 8))[:-2]
            + bytes((0x00, 0x00, 0x09, 0x00, 0x00)),
            # trailing zero at end of buffer = literal pixel 0
            bytes((0x05, 0x00)),
            # truncated 0xC0 missing its second byte
            bytes((0x05, 0x00, 0xC0)),
        ]
        for buf in cases:
            _assert_same_decode(buf, w, h)

    def test_fixture_corpus_buffers(self):
        urls = FX.tiny_corpus_payloads()
        checked = 0
        for rows in urls.values():
            for _ts, payload in rows:
                for ds in parse_payload(payload):
                    from pgstosrt_ray.merge import reassemble_fragments
                    reassemble_fragments(ds)
                    for frags in ds.bitmap_objects:
                        f = frags[0]
                        if f.width > 0 and f.height > 0 and f.data:
                            _assert_same_decode(f.data, f.width, f.height)
                            checked += 1
        assert checked > 20


# ---------------------------------------------------------------------------
# Mini merge: literal transcription of the backward scan + grouping +
# median pick + QualifiesForMerge + live-list RemoveAt semantics
# (BluRaySupParserImageSharp.cs:424-521, 533-558).

@dataclass
class MiniCue:
    start: int
    end: int
    width: int
    height: int
    buffers: list          # [bitmap_object][fragment] raw bytes
    palette_count: int
    nt_h: int
    nt_w: int
    pix: object            # pixel-identity token (dims+pixels)
    orig: int = -1
    deleted: bool = field(default=False)


def mini_merge(cues: list[MiniCue], skip_merge=False, force_merge_all=False):
    """Returns surviving original indices; mutates survivors'
    start/end like the reference."""
    sup = [c for c in cues]
    for i, c in enumerate(sup):
        c.orig = i
    if skip_merge and not force_merge_all:
        return [c.orig for c in sup]
    deletes = []  # (Number, Index) in append order
    delete_no = 0
    for pcs_index in range(len(sup) - 1, 0, -1):
        p1 = sup[pcs_index]
        p2 = sup[pcs_index - 1]
        if abs(p2.end - p1.start) < 10:
            if p2.width == p1.width:
                if p2.height == p1.height:
                    if (len(p1.buffers) > 0 and len(p1.buffers[0]) > 0
                            and len(p2.buffers) == len(p1.buffers)
                            and len(p2.buffers[0]) == len(p1.buffers[0])):
                        flag = True
                        for o1, o2 in zip(p1.buffers, p2.buffers):
                            if len(o2) == len(o1):
                                for b1, b2 in zip(o1, o2):
                                    if b1 != b2:
                                        flag = False
                                        break
                            else:
                                flag = False
                                break
                        if flag:
                            if (delete_no, pcs_index - 1) not in deletes:
                                deletes.append((delete_no, pcs_index - 1))
                            if (delete_no, pcs_index) not in deletes:
                                deletes.append((delete_no, pcs_index))
                            continue
                        delete_no += 1
                    continue  # structure mismatch: NO bump (:496)
        delete_no += 1

    def qualifies(arr, merge_count):
        if force_merge_all or merge_count < 3:
            return False
        if len(arr) != 2:
            return True
        q1 = sup[arr[0]]
        q2 = sup[arr[1]]
        d1 = q1.end / 90.0 - q1.start / 90.0
        d2 = q2.end / 90.0 - q2.start / 90.0
        if (d1 < 400.0 or d2 < 400.0
                or q1.palette_count > 2 or q2.palette_count > 2):
            return True
        if q1.nt_h > 110 or q1.nt_w > 300:
            return True
        return q1.pix == q2.pix

    groups = {}
    for num, index in deletes:
        groups.setdefault(num, []).append(index)
    merge_count = len(groups)
    for num in sorted(groups):
        arr = sorted(groups[num], reverse=True)
        mid = int(round(len(arr) / 2.0))
        keep = sup[arr[mid]]
        if qualifies(arr, merge_count):
            keep.start = sup[arr[-1]].start
            keep.end = sup[arr[0]].end
            for d in arr:
                if sup[d] is not keep:
                    sup[d].deleted = True
    return [c.orig for c in sup if not c.deleted]


def _random_cues(rng: random.Random, n: int) -> list[MiniCue]:
    bufs = [b"AAA", b"BBB", b"CCCC"]
    cues = []
    t = 0
    for _ in range(n):
        dur = rng.choice([90, 9000, 36000, 90000])  # 1ms..1s
        gap = rng.choice([0, 1, 5, 9, 10, 11, 2000])
        start = t + gap
        end = start + dur
        t = end
        n_obj = rng.choice([1, 1, 1, 2])
        buffers = [[rng.choice(bufs)] for _ in range(n_obj)]
        if rng.random() < 0.15:
            buffers = []  # no bitmap objects: structure precondition off
        cues.append(MiniCue(
            start=start, end=end, width=rng.choice([1920, 1280]),
            height=1080, buffers=buffers,
            palette_count=rng.choice([1, 1, 1, 3]),
            nt_h=rng.choice([16, 120]), nt_w=rng.choice([60, 400]),
            pix=rng.choice(["p1", "p1", "p2"])))
    return cues


def _views_of(cues: list[MiniCue]):
    views = [CueView(
        start_ticks=c.start, end_ticks=c.end, width=c.width,
        height=c.height, n_objects=len(c.buffers),
        obj_keys=tuple(tuple((len(b), b) for b in obj)
                       for obj in c.buffers),
        palette_count=c.palette_count) for c in cues]
    metas = [DecodeMeta(dec_h=66, dec_w=110, nt_h=c.nt_h, nt_w=c.nt_w,
                        pixel_sha=c.pix) for c in cues]
    return views, metas


@pytest.mark.parametrize("skip,force", [(False, False), (True, False),
                                        (False, True), (True, True)])
def test_mini_merge_matches_kernel_randomized(skip, force):
    rng = random.Random(42)
    for trial in range(200):
        cues = _random_cues(rng, rng.randint(0, 12))
        views, metas = _views_of(cues)
        got = merge_cue_runs(views, metas.__getitem__,
                             skip_merge=skip, force_merge_all=force)
        exp = mini_merge([MiniCue(**{**c.__dict__}) for c in cues],
                         skip_merge=skip, force_merge_all=force)
        assert got == exp, f"trial {trial}: {got} != {exp}"
        # surviving cue times must match too (min-start/max-end mutation)
        mini = [MiniCue(**{**c.__dict__}) for c in cues]
        mini_merge(mini, skip_merge=skip, force_merge_all=force)
        for k in got:
            assert (views[k].start_ticks, views[k].end_ticks) == \
                (mini[k].start, mini[k].end), f"trial {trial} cue {k}"


def test_mini_merge_matches_kernel_on_fixture_corpus():
    from pgstosrt_ray.merge import (cue_view_of, end_time_fill,
                                    reassemble_fragments)
    from pgstosrt_ray.decode import cue_meta_and_text
    urls = FX.tiny_corpus_payloads()
    compared = 0
    for rows in urls.values():
        cues = []
        for _ts, payload in sorted(rows, key=lambda r: r[0]):
            cues.extend(parse_payload(payload))
        end_time_fill(cues)
        cues = [c for c in cues if len(c.objects) > 0]
        for c in cues:
            reassemble_fragments(c)
        views = [cue_view_of(c) for c in cues]
        metas = {}

        def get_meta(i):
            if i not in metas:
                metas[i] = cue_meta_and_text(cues[i])[0]
            return metas[i]

        got = merge_cue_runs(views, get_meta)
        mini = [MiniCue(
            start=c.start_ticks, end=c.end_ticks, width=c.width,
            height=c.height,
            buffers=[[f.data for f in frags] for frags in c.bitmap_objects],
            palette_count=len(c.palette_buffers),
            nt_h=get_meta(i).nt_h, nt_w=get_meta(i).nt_w,
            pix=(get_meta(i).dec_h, get_meta(i).dec_w,
                 get_meta(i).pixel_sha))
            for i, c in enumerate(cues)]
        exp = mini_merge(mini)
        assert got == exp
        compared += 1
    assert compared >= 15
