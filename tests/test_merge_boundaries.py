"""Exact threshold boundaries of the near-dup merge (reference
BluRaySupParserImageSharp.cs:432,538,546,554): strict inequalities must
stay strict."""

from pgstosrt_ray.decode import DecodeMeta
from pgstosrt_ray.merge import CueView, merge_cue_runs


def _view(start, end, key=b"K"):
    return CueView(start_ticks=start, end_ticks=end, width=1920, height=1080,
                   n_objects=1, obj_keys=(((1, key),),), palette_count=1)


def _meta(nt_h=16, nt_w=60, sha=b"m", dh=66, dw=110):
    return DecodeMeta(dec_h=dh, dec_w=dw, nt_h=nt_h, nt_w=nt_w,
                      pixel_sha=sha)


def _padding_groups(base=10_000_000):
    """Two extra merge-run groups so mergeCount >= 3 (:538)."""
    out = []
    for g in range(2):
        b = base + g * 1_000_000
        out += [_view(b, b + 90000), _view(b + 90000, b + 180000)]
    return out


def test_gap_9_ticks_merges_gap_10_does_not():
    # |prev.end - cur.start| < 10 (:432): 9 qualifies, 10 does not
    for gap, expect_merged in ((9, True), (10, False)):
        views = [_view(0, 90000), _view(90000 + gap, 180000)]
        views += _padding_groups()
        keep = merge_cue_runs(views, lambda i: _meta())
        merged = len(keep) < len(views) - 2  # padding pairs always merge
        assert merged == expect_merged, f"gap={gap}"


def test_duration_399_merges_400_does_not_without_other_triggers():
    # pair heuristic: duration < 400.0 ms (:546); exactly 400 falls
    # through to extents/pixel checks — make those not trigger and the
    # decodes pixel-different so the pair stays unmerged
    for dur_ms, expect_merged in ((399, True), (400, False)):
        ticks = dur_ms * 90
        views = [_view(0, ticks), _view(ticks, 2 * ticks)]
        views += _padding_groups()
        metas = {0: _meta(sha=b"a"), 1: _meta(sha=b"b")}
        keep = merge_cue_runs(views, lambda i: metas.get(i, _meta()))
        merged = 0 not in keep or 1 not in keep
        assert merged == expect_merged, f"dur={dur_ms}"


def test_extent_111_triggers_110_does_not():
    # nt_height > 110 (:554): 111 merges, 110 falls through to the
    # pixel compare (make it fail => no merge)
    for nt_h, expect_merged in ((111, True), (110, False)):
        views = [_view(0, 90000), _view(90000, 180000)]
        views += _padding_groups()
        metas = {0: _meta(nt_h=nt_h, sha=b"a"), 1: _meta(nt_h=nt_h, sha=b"b")}
        keep = merge_cue_runs(views, lambda i: metas.get(i, _meta()))
        merged = 0 not in keep or 1 not in keep
        assert merged == expect_merged, f"nt_h={nt_h}"


def test_extent_width_301_triggers():
    views = [_view(0, 90000), _view(90000, 180000)]
    views += _padding_groups()
    metas = {0: _meta(nt_w=301, sha=b"a"), 1: _meta(nt_w=301, sha=b"b")}
    keep = merge_cue_runs(views, lambda i: metas.get(i, _meta()))
    assert 0 not in keep or 1 not in keep


def test_merge_count_exactly_three_enables():
    # two groups => no merging; three => merging (:538 mergeCount < 3)
    views2 = []
    for g in range(2):
        b = g * 1_000_000
        views2 += [_view(b, b + 90000), _view(b + 90000, b + 180000)]
    assert len(merge_cue_runs(views2, lambda i: _meta())) == 4
    views3 = views2 + [_view(5_000_000, 5_090_000),
                       _view(5_090_000, 5_180_000)]
    assert len(merge_cue_runs(views3, lambda i: _meta())) == 3


def test_zero_end_time_gap_arithmetic():
    # a cue whose end stayed 0 compares |0 - next.start| (:432): far
    # apart => no run membership
    views = [_view(0, 0), _view(1_000_000, 1_090_000)]
    views += _padding_groups()
    keep = merge_cue_runs(views, lambda i: _meta())
    assert 0 in keep and 1 in keep
