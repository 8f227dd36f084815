"""Multimodal column plumbing (task-mandated): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by actor-pool
``map_batches`` stages.

The container has no image/audio libraries, so the DECODE KERNEL is
stubbed (import-gated with a deterministic fake), but the Ray-side
plumbing — schema, batch sizing for large binaries, actor signature,
output layout — is real and tested. The fixture corpus's ``html``
binary payloads stand in for media blobs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_META_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("n_bytes", pa.int64()),
    ("magic", pa.string()),          # sniffed container format
    ("media_type", pa.string()),     # image | audio | video | unknown
    ("feature", pa.list_(pa.float32())),  # extracted feature vector
])


def _sniff(data: bytes) -> tuple[str, str]:
    if data[:2] == b"PG":
        return "PG", "image"      # our segment streams carry bitmaps
    if data[:4] == b"MKPG":
        return "MKPG", "video"    # the container variant
    if data[:4] == b"\x89PNG":
        return "PNG", "image"
    if data[:3] == b"ID3" or data[:2] == b"\xff\xfb":
        return "MP3", "audio"
    return "?", "unknown"


class MediaFeatureStage:
    """Actor-pool stage: decode + feature-extract media blobs.

    ``__init__`` loads the decoder once per actor. With no media libs
    present, the decode step falls back to a deterministic fake feature
    (seeded from the payload hash) — clearly marked; swap ``_decode``
    for a real kernel (PIL / torchaudio / pyav) when available."""

    FEATURE_DIM = 8

    def __init__(self):
        try:  # pragma: no cover - library not present in this container
            import PIL.Image  # noqa: F401
            self.has_decoder = True
        except ImportError:
            self.has_decoder = False

    def _decode(self, data: bytes) -> np.ndarray:
        if self.has_decoder:  # pragma: no cover
            raise NotImplementedError(
                "real media decode goes here (PIL/pyav kernel)")
        # deterministic fake: 8 floats derived from md5 over the
        # UPPERCASE hex of the payload (+ a second-round md5) — chosen
        # to be exactly re-expressible in DuckDB (md5/hex take VARCHAR
        # only), so the driver value-checks this stage end to end
        hx = data.hex().upper().encode()
        h1 = hashlib.md5(hx)
        h2 = hashlib.md5(h1.hexdigest().encode()).digest()
        raw = np.frombuffer(h1.digest() + h2, dtype="<u4")
        return (raw / np.float64(2**32)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        blobs = batch.column("html").to_pylist()
        magics, types, feats, sizes = [], [], [], []
        for b in blobs:
            m, t = _sniff(b)
            magics.append(m)
            types.append(t)
            sizes.append(len(b))
            feats.append(self._decode(b))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "n_bytes": pa.array(sizes, pa.int64()),
            "magic": pa.array(magics, pa.string()),
            "media_type": pa.array(types, pa.string()),
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32())),
        })


def _pool_size():
    """Media-stage actor-pool bounds: autoscale 2..~80% of cluster CPUs
    (round 2 hardcoded concurrency=2, starving a 32-CPU node)."""
    from .reduce import cluster_cpus
    return (2, max(2, round(cluster_cpus() * 0.8)))


def media_features(pages_ds):
    """pages -> media metadata + features. Small batches: media blobs
    are large, so batch_size is held down to bound actor heap."""
    return pages_ds.map_batches(MediaFeatureStage, batch_format="pyarrow",
                                batch_size=16, concurrency=_pool_size(),
                                num_cpus=1)


FRAME_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("frame_idx", pa.int32()),      # index among the payload's frames
    ("start_ms", pa.int64()),
    ("end_ms", pa.int64()),
    ("n_bytes", pa.int64()),
    # hex STRING, not binary: DuckDB surfaces BLOB columns to pandas as
    # unhashable ``bytearray`` objects, which breaks any hash/factorize
    # based value compare (incl. the round driver's) on the oracle side
    ("frame_sha", pa.string()),
])


class FrameSampleStage:
    """Actor-pool stage: K-evenly-spaced frame sampling for
    video-typed payloads. The container walk is REAL (MKPG block
    framing, same layout parse.parse_mkv_container reads); only the
    pixel decode of a sampled frame would need a media lib. Non-video
    rows contribute no frames."""

    def __init__(self, k: int = 4):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..format import MKV_MAGIC, be32
        cols: dict[str, list] = {n: [] for n in FRAME_SCHEMA.names}
        for url, data in zip(batch.column("url").to_pylist(),
                             batch.column("html").to_pylist()):
            if data[:4] != MKV_MAGIC:
                continue
            frames = []   # (start_ms, end_ms, payload) data blocks
            pos = 4
            while pos + 12 <= len(data):
                start_ms = be32(data, pos)
                end_ms = be32(data, pos + 4)
                ln = be32(data, pos + 8)
                blk = data[pos + 12:pos + 12 + ln]
                if len(blk) > 2:      # data block (gap markers are tiny)
                    frames.append((start_ms, end_ms, blk))
                pos += 12 + ln
            if not frames:
                continue
            picks = np.unique(np.linspace(0, len(frames) - 1,
                                          num=min(self.k, len(frames)),
                                          dtype=np.int64))
            for fi in picks:
                s, e, blk = frames[fi]
                cols["url"].append(url)
                cols["frame_idx"].append(int(fi))
                cols["start_ms"].append(int(s))
                cols["end_ms"].append(int(e))
                cols["n_bytes"].append(len(blk))
                cols["frame_sha"].append(hashlib.sha256(blk).hexdigest())
        return pa.Table.from_pydict(cols, schema=FRAME_SCHEMA)


def media_frame_sample(pages_ds, k: int = 4):
    """pages -> sampled frame metadata for video payloads."""
    return pages_ds.map_batches(FrameSampleStage, batch_format="pyarrow",
                                batch_size=16, concurrency=_pool_size(),
                                num_cpus=1, fn_constructor_kwargs={"k": k})


THUMB_T = 16
THUMB_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("obj_w", pa.int32()),
    ("obj_h", pa.int32()),
    ("thumb_sha", pa.string()),      # hex text (BLOB-compare gotcha)
])


class ThumbnailStage:
    """Actor-pool stage: REAL pixel decode + resize — no media lib
    needed, because image-typed payloads here are PGS segment streams
    and the RLE decoder is the pipeline's own (decode.py, the same
    kernel the flagship OCR path uses).

    Contract (mirrored byte-for-byte by golden.golden_media_thumbnail,
    which carries its OWN segment walk and RLE decoder): take the
    FIRST ODS object in the stream (its first-fragment header gives
    width/height; continuation fragments of the same object id append
    until the next first-fragment), RLE-decode to the (h, w)
    palette-index image, nearest-neighbor resize to THUMB_T x THUMB_T
    (src = (i * dim) // T), sha256-hex the resized index bytes.
    Non-PG payloads and streams with no decodable object emit no row."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..decode import decode_object_indexed
        from ..format import be16
        cols: dict[str, list] = {n: [] for n in THUMB_SCHEMA.names}
        t = THUMB_T
        for url, data in zip(batch.column("url").to_pylist(),
                             batch.column("html").to_pylist()):
            first = self._first_object(data, be16)
            if first is None:
                continue
            w, h, buf = first
            if w <= 0 or h <= 0 or not buf:
                continue
            idx, _written = decode_object_indexed(buf, w, h)
            rows = (np.arange(t, dtype=np.int64) * idx.shape[0]) // t
            colsel = (np.arange(t, dtype=np.int64) * idx.shape[1]) // t
            thumb = idx[np.ix_(rows, colsel)]
            cols["url"].append(url)
            cols["obj_w"].append(w)
            cols["obj_h"].append(h)
            cols["thumb_sha"].append(
                hashlib.sha256(thumb.tobytes()).hexdigest())
        return pa.Table.from_pydict(cols, schema=THUMB_SCHEMA)

    @staticmethod
    def _first_object(data: bytes, be16) -> tuple | None:
        """13-byte-header segment walk collecting the first ODS
        object's fragments (id pinned at the first is-first fragment,
        stopping at that id's next is-first fragment)."""
        if data[:2] != b"PG":
            return None
        pos, target, w, h, frags = 0, None, 0, 0, []
        while pos + 13 <= len(data):
            if data[pos:pos + 2] != b"PG":
                break
            seg_type = data[pos + 10]
            size = be16(data, pos + 11)
            body = data[pos + 13:pos + 13 + size]
            pos += 13 + size
            if seg_type != 0x15 or len(body) < 4:
                continue
            obj_id = be16(body, 0)
            is_first = (body[3] & 0x80) == 0x80
            if target is None:
                if is_first and len(body) >= 11:
                    target = obj_id
                    w, h = be16(body, 7), be16(body, 9)
                    frags = [body[11:]]
            elif obj_id == target:
                if is_first:
                    break             # next version of the object
                frags.append(body[4:])
        if target is None:
            return None
        return w, h, b"".join(frags)


def media_thumbnail(pages_ds):
    """pages -> real decoded-bitmap thumbnails for image payloads."""
    return pages_ds.map_batches(ThumbnailStage, batch_format="pyarrow",
                                batch_size=16, concurrency=_pool_size(),
                                num_cpus=1)
