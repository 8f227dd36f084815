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


def media_features(pages_ds):
    """pages -> media metadata + features. Small batches: media blobs
    are large, so batch_size is held down to bound actor heap."""
    return pages_ds.map_batches(MediaFeatureStage, batch_format="pyarrow",
                                batch_size=16, concurrency=2, num_cpus=1)
