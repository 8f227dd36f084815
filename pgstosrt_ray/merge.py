"""Per-url cue-list passes: end-time fill, empty filter, fragment
reassembly, and the near-duplicate neighbor merge (SURVEY.md §2 M7, M8,
M6, D2). ONE implementation shared verbatim by the single-threaded
oracle and the Ray ``groupby(url).map_groups`` assembly stage — that
sharing is what makes the byte-identity gate hold by construction.

Reference semantics (studied, not copied),
/root/reference/src/PgsToSrt/BluRaySup/BluRaySupParserImageSharp.cs:
  - end-time forward fill: :391-396
  - empty-composition filter: :398
  - fragment reassembly: :399-422
  - merge-run detection (backward scan, 10-tick gap, equal canvas,
    equal structure, byte-identical RLE buffers): :424-502
  - run grouping + median pick (C# Math.Round banker's rounding, which
    Python's round() matches) + min-start/max-end + removals: :504-520
  - QualifiesForMerge: :533-558. NOTE the reference returns false when
    ForceMergeAll is set (:538) — i.e. the flag *disables* merging
    despite its name; we replicate that behavior exactly.

The merge operates on ``CueView`` metadata, not raw bitmaps: buffer
byte-equality is evaluated through per-object SHA-256 keys and
pixel-equality through ``DecodeMeta`` (dims + pixel-buffer SHA-256), so
the same decisions can be made after a shuffle without shipping dense
images. Both sides of the identity gate use the same keys.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Callable

from .decode import DecodeMeta
from .parse import DisplaySet, OdsFrag

TICKS_PER_MS = 90.0


def end_time_fill(cues: list) -> None:
    """Forward-fill: a cue with end==0 closes at the next cue's start
    (reference :391-396). Mutates in place; runs BEFORE the empty filter
    (an empty composition's start can close the previous cue)."""
    for i in range(1, len(cues)):
        if cues[i - 1].end_ticks == 0:
            cues[i - 1].end_ticks = cues[i].start_ticks


def reassemble_fragments(ds: DisplaySet) -> None:
    """Concatenate multi-fragment ODS buffers (reference :399-422).
    Rebuilds fresh single-fragment lists (no cross-cue aliasing)."""
    new_objects = []
    for frags in ds.bitmap_objects:
        if len(frags) > 1:
            merged = b"".join(f.data for f in frags)
            f0 = frags[0]
            new_objects.append([OdsFrag(object_id=f0.object_id,
                                        version=f0.version, is_first=True,
                                        width=f0.width, height=f0.height,
                                        data=merged)])
        else:
            new_objects.append(list(frags))
    ds.bitmap_objects = new_objects


@dataclass
class CueView:
    """Merge-relevant metadata for one cue. ``obj_keys`` holds one
    (length, sha256) key per bitmap object per fragment (post-reassembly:
    one fragment each); byte-equality of RLE buffers (:446-469) is
    evaluated as key equality."""
    start_ticks: int
    end_ticks: int
    width: int
    height: int
    n_objects: int                       # PcsObjects.Count
    obj_keys: tuple[tuple[tuple[int, bytes], ...], ...]  # [bitmap_obj][fragment]
    palette_count: int                   # PaletteInfos.Count


def buffer_key(data: bytes) -> tuple[int, bytes]:
    return (len(data), hashlib.sha256(data).digest())


def cue_view_of(ds: DisplaySet) -> CueView:
    return CueView(
        start_ticks=ds.start_ticks, end_ticks=ds.end_ticks,
        width=ds.width, height=ds.height, n_objects=len(ds.objects),
        obj_keys=tuple(tuple(buffer_key(f.data) for f in frags)
                       for frags in ds.bitmap_objects),
        palette_count=len(ds.palette_buffers),
    )


def _structure_and_bytes_equal(a: CueView, b: CueView) -> tuple[bool, bool]:
    """(precondition, all_equal) per the nested check at :446-469:
    precondition = a has >=1 bitmap object with >=1 fragment and b
    matches a's outer count and first-object fragment count."""
    if not (len(a.obj_keys) > 0 and len(a.obj_keys[0]) > 0
            and len(b.obj_keys) == len(a.obj_keys)
            and len(b.obj_keys[0]) == len(a.obj_keys[0])):
        return False, False
    for fa, fb in zip(a.obj_keys, b.obj_keys):
        if len(fa) != len(fb) or fa != fb:
            return True, False
    return True, True


def _qualifies_for_merge(arr: list[int], views: list[CueView], merge_count: int,
                         get_meta: Callable[[int], DecodeMeta],
                         force_merge_all: bool) -> bool:
    """QualifiesForMerge (reference :533-558). ``arr`` is the run's
    original indices in descending order."""
    if force_merge_all or merge_count < 3:
        return False
    if len(arr) != 2:
        return True
    pcs1 = views[arr[0]]  # the later cue
    pcs2 = views[arr[1]]
    # computed as end_ms - start_ms (not (end-start)/90) to match the
    # reference's TimeCode arithmetic bit-for-bit (:544-545, :700-702)
    dur1 = pcs1.end_ticks / TICKS_PER_MS - pcs1.start_ticks / TICKS_PER_MS
    dur2 = pcs2.end_ticks / TICKS_PER_MS - pcs2.start_ticks / TICKS_PER_MS
    if (dur1 < 400.0 or dur2 < 400.0
            or pcs1.palette_count > 2 or pcs2.palette_count > 2):
        return True
    m1 = get_meta(arr[0])
    if m1.nt_h > 110 or m1.nt_w > 300:
        return True
    m2 = get_meta(arr[1])
    return (m1.dec_h == m2.dec_h and m1.dec_w == m2.dec_w
            and m1.pixel_sha == m2.pixel_sha)


def merge_cue_runs(views: list[CueView],
                   get_meta: Callable[[int], DecodeMeta],
                   *, skip_merge: bool = False,
                   force_merge_all: bool = False) -> list[int]:
    """Near-duplicate neighbor merge (reference :424-521). Returns the
    surviving ORIGINAL indices in order; merged survivors have their
    start/end mutated in ``views`` (min start / max end of the run).

    The outer gate replicates `if (!SkipMerge || ForceMergeAll)` (:424)
    and QualifiesForMerge's `ForceMergeAll => false` (:538)."""
    n = len(views)
    alive = list(range(n))
    if skip_merge and not force_merge_all:
        return alive
    deletes: list[tuple[int, int]] = []  # (group_number, original_index)
    have = set()
    delete_no = 0
    for i in range(n - 1, 0, -1):
        c1 = views[i]
        c2 = views[i - 1]
        if (abs(c2.end_ticks - c1.start_ticks) < 10
                and c2.width == c1.width and c2.height == c1.height):
            precond, equal = _structure_and_bytes_equal(c1, c2)
            if precond:
                if equal:
                    if (delete_no, i - 1) not in have:
                        deletes.append((delete_no, i - 1))
                        have.add((delete_no, i - 1))
                    if (delete_no, i) not in have:
                        deletes.append((delete_no, i))
                        have.add((delete_no, i))
                    continue
                delete_no += 1
            # structure precondition failed: fall through without bumping
            # the group number (reference :496)
            continue
        delete_no += 1
    groups: dict[int, list[int]] = {}
    for num, idx in deletes:
        groups.setdefault(num, []).append(idx)
    merge_count = len(groups)
    removed: set[int] = set()
    for num in sorted(groups):
        arr = sorted(groups[num], reverse=True)
        mid = int(round(len(arr) / 2.0))  # banker's, matches C# Math.Round (:508)
        target = arr[mid]
        if _qualifies_for_merge(arr, views, merge_count, get_meta,
                                force_merge_all):
            views[target].start_ticks = views[arr[-1]].start_ticks
            views[target].end_ticks = views[arr[0]].end_ticks
            for d in arr:
                if d != target:
                    removed.add(d)
    return [i for i in alive if i not in removed]
