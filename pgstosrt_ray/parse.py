"""Per-payload segment-walk state machine: bytes -> display sets.

Faithful re-expression of the reference's single-pass parser
(/root/reference/src/PgsToSrt/BluRaySup/BluRaySupParserImageSharp.cs:259-398)
plus the Matroska-block variant (:26-72). Pure Python, no Ray: each
``pages`` row's ``html`` payload is self-contained, so this runs inside
a ``map_batches`` UDF with no cross-row state (SURVEY.md §2.3 O3).

Deviation from the reference, by design (documented in SURVEY §2.9):
the per-stream tail passes (end-time forward-fill :391-396, empty-
composition filter :398, fragment reassembly :399-422, near-dup merge
:424-521) are NOT applied here. They operate on the url's complete
time-ordered cue list, which in the generalized multi-row-per-url world
only exists after the groupby(url) shuffle — see merge.py. For a
single-payload url the end-to-end result is identical to the reference
order (fill -> filter -> reassemble -> merge).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import format as F


@dataclass
class PcsObj:
    """Region placement (reference PcsObject :611-620, parsed :109-118)."""
    object_id: int
    window_id: int
    forced: bool
    x: int
    y: int


@dataclass
class OdsFrag:
    """Bitmap fragment (reference OdsData :716-729, parsed :217-257)."""
    object_id: int
    version: int
    is_first: bool
    width: int
    height: int
    data: bytes


@dataclass
class DisplaySet:
    """One completed composition (reference PcsData :664-703)."""
    comp_num: int
    comp_state: int
    palette_update: bool
    start_ticks: int
    end_ticks: int = 0
    width: int = 0
    height: int = 0
    fps_type: int = 0
    palette_id: int = 0
    objects: list[PcsObj] = field(default_factory=list)
    # one inner list per *found* object id, in object order — replicating
    # CompletePcs (:176-188), which appends only ids present in the
    # bitmap-object dict (missing ids shift later entries left).
    bitmap_objects: list[list[OdsFrag]] = field(default_factory=list)
    # snapshot of all palette versions for palette_id at completion (:175)
    palette_buffers: list[bytes] = field(default_factory=list)

    @property
    def is_forced(self) -> bool:
        """Any object forced (reference :690-693)."""
        return any(o.forced for o in self.objects)

    def position(self) -> tuple[int, int]:
        """(min x, min y) over objects, (0,0) if none (reference :695-698)."""
        if not self.objects:
            return (0, 0)
        return (min(o.x for o in self.objects), min(o.y for o in self.objects))


def _parse_pcs_payload(buf: bytes, pts: int) -> DisplaySet:
    """PCS body parse (reference ParsePicture :120-162)."""
    if len(buf) < 11:
        return DisplaySet(comp_num=0, comp_state=F.STATE_INVALID,
                          palette_update=False, start_ticks=pts)
    ds = DisplaySet(
        comp_num=F.be16(buf, 5),
        comp_state=F.composition_state_from_byte(buf[7]),
        palette_update=buf[8] == 0x80,
        start_ticks=pts,
        width=F.be16(buf, 0),
        height=F.be16(buf, 2),
        fps_type=buf[4],
        palette_id=buf[9],
    )
    if ds.comp_state == F.STATE_INVALID:
        return ds
    n = buf[10]
    off = 0
    for _ in range(n):
        ds.objects.append(PcsObj(
            object_id=F.be16(buf, 11 + off),
            window_id=buf[13 + off],
            forced=(buf[14 + off] & 0x40) == 0x40,
            x=F.be16(buf, 15 + off),
            y=F.be16(buf, 17 + off),
        ))
        off += 8
    return ds


def _parse_pds_payload(buf: bytes, seg_size: int):
    """PDS body parse (reference ParsePds :191-215). Returns
    (palette_id, version, raw_entries_buffer) or None for empty."""
    palette_size = (seg_size - 2) // 5
    if palette_size <= 0 or len(buf) < 2:
        return None
    return buf[0], buf[1], bytes(buf[2:2 + palette_size * 5])


def _parse_ods_payload(buf: bytes, seg_size: int, force_first: bool) -> OdsFrag:
    """ODS body parse (reference ParseOds :217-257)."""
    obj_id = F.be16(buf, 0)
    version = buf[2]
    flags = buf[3]
    is_first = (flags & 0x80) == 0x80 or force_first
    if is_first:
        return OdsFrag(object_id=obj_id, version=version, is_first=True,
                       width=F.be16(buf, 7), height=F.be16(buf, 9),
                       data=bytes(buf[11:seg_size]))
    return OdsFrag(object_id=obj_id, version=version, is_first=False,
                   width=0, height=0, data=bytes(buf[4:seg_size]))


def _complete_pcs(ds: DisplaySet, bitmap_objects: dict[int, list[OdsFrag]],
                  palettes: dict[int, list[bytes]]) -> bool:
    """CompletePcs (reference :164-189): join the open composition to its
    palette versions (missing palette => drop) and to >=1 bitmap object.
    Empty compositions complete successfully (and are filtered later)."""
    if palettes is None or ds.comp_state == F.STATE_INVALID:
        # Invalid composition state leaves PcsObjects null in the
        # reference (:125-128,142-145) => CompletePcs fails (:169-170).
        return False
    if len(ds.objects) == 0:
        return True
    if ds.palette_id not in palettes:
        return False
    ds.palette_buffers = list(palettes[ds.palette_id])
    ds.bitmap_objects = []
    found = False
    for obj in ds.objects:
        if obj.object_id in bitmap_objects:
            ds.bitmap_objects.append(bitmap_objects[obj.object_id])
            found = True
    return found


def parse_segment_stream(data: bytes, *, mkv_headers: bool = False,
                         last_palettes: dict[int, list[bytes]] | None = None,
                         bitmap_objects: dict[int, list[OdsFrag]] | None = None
                         ) -> list[DisplaySet]:
    """The segment walk (reference ParseBluRaySup :259-390 through the
    tail flush; the post-walk list passes are deliberately elsewhere —
    see module docstring). ``last_palettes``/``bitmap_objects`` persist
    across chunk parses in the Matroska path (:34-35,47,523-528)."""
    if last_palettes is None:
        last_palettes = {}
    if bitmap_objects is None:
        bitmap_objects = {}
    palettes: dict[int, list[bytes]] = {}
    # walker state is a mutable dict so mutations made BEFORE a
    # throw-capable body parse survive the per-segment catch, exactly
    # like the reference's locals inside its try block (:329-331 sets
    # forceFirst=true before ParsePicture; :365 before CompletePcs)
    st: dict = {"open": None, "force_first": True}
    out: list[DisplaySet] = []
    hdr_len = 3 if mkv_headers else 13
    pos = 0
    n = len(data)
    while pos + hdr_len <= n:
        hdr = data[pos:pos + hdr_len]
        if mkv_headers:
            seg_type, seg_size, pts = hdr[0], F.be16(hdr, 1), 0
        else:
            if hdr[0] == 0x50 and hdr[1] == 0x47:
                pts = F.be32(hdr, 2)
                seg_type = hdr[10]
                seg_size = F.be16(hdr, 11)
            else:
                seg_type, seg_size, pts = 0, 0, 0
        body_start = pos + hdr_len
        if body_start + seg_size > n:
            break  # truncated payload: stop cleanly (reference :275-282)
        buf = data[body_start:body_start + seg_size]
        try:
            _process_segment(seg_type, buf, seg_size, pts, st, out,
                             palettes, last_palettes, bitmap_objects)
        except IndexError:
            # malformed segment body: skip it and keep walking, like
            # the reference's per-segment IndexOutOfRange catch
            # (:380-383 logs and continues); state mutations made
            # before the throw (force_first, completed appends) stand
            pass
        pos = body_start + seg_size
    open_ds = st["open"]
    # tail flush (:389-390)
    if open_ds is not None and _complete_pcs(
            open_ds, bitmap_objects, palettes if palettes else last_palettes):
        out.append(open_ds)
    # persist palettes for the next chunk in the mkv path (:523-528)
    if last_palettes is not None and palettes:
        last_palettes.clear()
        last_palettes.update(palettes)
    return out


def _process_segment(seg_type, buf, seg_size, pts, st,
                     out, palettes, last_palettes, bitmap_objects):
    """One arm of the segment switch (reference :284-375). Mutates the
    walker state ``st`` ({"open", "force_first"}) in place so partial
    mutations survive a mid-arm IndexError like the reference's."""
    open_ds = st["open"]
    if seg_type == F.SEG_PDS:
        if open_ds is not None:
            pds = _parse_pds_payload(buf, seg_size)
            if pds is not None:
                pal_id, _ver, entries = pds
                if pal_id not in palettes:
                    palettes[pal_id] = []
                elif open_ds.palette_update:
                    # replace last version on palette update (:292-296)
                    palettes[pal_id].pop()
                palettes[pal_id].append(entries)
    elif seg_type == F.SEG_ODS:
        if open_ds is not None:
            ods = _parse_ods_payload(buf, seg_size, st["force_first"])
            if not open_ds.palette_update:
                if ods.is_first:
                    bitmap_objects[ods.object_id] = [ods]
                elif ods.object_id in bitmap_objects:
                    bitmap_objects[ods.object_id].append(ods)
            # reached only when ParseOds did not throw (:323)
            st["force_first"] = False
    elif seg_type == F.SEG_PCS:
        if open_ds is not None and _complete_pcs(
                open_ds, bitmap_objects,
                palettes if palettes else last_palettes):
            out.append(open_ds)
        # set BEFORE the throw-capable PCS body parse and kept on throw
        # (reference :329-331: forceFirst = true; ... ParsePicture)
        st["force_first"] = True
        ds = _parse_pcs_payload(buf, pts)
        # close the previous cue with this start time (:333-334)
        if ds.start_ticks > 0 and out and out[-1].end_ticks == 0:
            out[-1].end_ticks = ds.start_ticks
        st["open"] = ds
        if ds.comp_state == F.STATE_EPOCH_START:
            bitmap_objects.clear()
            palettes.clear()
    elif seg_type == F.SEG_WDS:
        pass  # window geometry is log-only in the reference (:344-363)
    elif seg_type == F.SEG_END:
        # BEFORE the throw-capable CompletePcs (reference :365)
        st["force_first"] = True
        if open_ds is not None:
            if _complete_pcs(open_ds, bitmap_objects,
                             palettes if palettes else last_palettes):
                out.append(open_ds)
            st["open"] = None


def _contains_start_segment(data: bytes) -> bool:
    """END-segment sniffer over 3-byte-framed data (reference :74-85)."""
    i = 0
    while i + 3 <= len(data):
        if data[i] == 0x80:
            return True
        i += F.be16(data, i + 1) + 3
    return False


def parse_mkv_container(data: bytes) -> list[DisplaySet]:
    """The Matroska-variant walk (reference ParseBluRaySupFromMatroska
    :26-72): stitch 3-byte-framed blocks into display-set chunks, parse
    each with persistent palette/object state, override timestamps with
    container times ((ms-1)*90.0 truncated, :45,49-50), clip overlaps
    (end = next start - 1 tick, :52-53), and cap runaway open cues
    (> 1,000,000 ticks => zero duration, :62-67)."""
    assert data[:4] == F.MKV_MAGIC
    blocks: list[tuple[int, int, bytes]] = []
    pos = 4
    while pos + 12 <= len(data):
        start_ms = F.be32(data, pos)
        end_ms = F.be32(data, pos + 4)
        ln = F.be32(data, pos + 8)
        blocks.append((start_ms, end_ms, bytes(data[pos + 12:pos + 12 + ln])))
        pos += 12 + ln
    out: list[DisplaySet] = []
    last_palettes: dict[int, list[bytes]] = {}
    bitmap_objects: dict[int, list[OdsFrag]] = {}
    pending = bytearray()
    for b_idx, (start_ms, end_ms, blk) in enumerate(blocks):
        if len(blk) > 2:
            pending += blk
            if _contains_start_segment(blk):
                if out and out[-1].start_ticks == out[-1].end_ticks:
                    out[-1].end_ticks = int((start_ms - 1) * 90.0)
                for ds in parse_segment_stream(bytes(pending), mkv_headers=True,
                                               last_palettes=last_palettes,
                                               bitmap_objects=bitmap_objects):
                    ds.start_ticks = int((start_ms - 1) * 90.0)
                    ds.end_ticks = int((end_ms - 1) * 90.0)
                    out.append(ds)
                    if 1 < len(out) <= len(blocks) and blocks[len(out) - 2][1] > blocks[len(out) - 1][0]:
                        out[-2].end_ticks = out[-1].start_ticks - 1
                pending = bytearray()
        elif out:
            last = out[-1]
            if last.start_ticks == last.end_ticks:
                last.end_ticks = int((start_ms - 1) * 90.0)
                if last.end_ticks - last.start_ticks > 1_000_000:
                    last.end_ticks = last.start_ticks
    return out


def parse_payload(data: bytes) -> list[DisplaySet]:
    """Format dispatch (reference PgsParser.Load :21-28 routes on file
    extension; we sniff the payload magic instead)."""
    if data[:4] == F.MKV_MAGIC:
        return parse_mkv_container(data)
    return parse_segment_stream(data)
