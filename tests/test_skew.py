"""Skew-router test: a url with a multi-MB payload is split into
byte-bounded cue blocks (single input pass) and the result stays
byte-identical to the oracle."""

import pyarrow as pa
import pytest

from pgstosrt_ray import fixtures as FX
from pgstosrt_ray.config import PipelineConfig
from pgstosrt_ray.oracle import extract_url
from pgstosrt_ray.pipelines.extract import extract_docs


@pytest.fixture(scope="module")
def skewed_pages():
    rows = []
    # one giant payload: many large-scale cues in one stream
    specs = []
    for i in range(40):
        specs.append(FX.text_ds(f"giant cue number {i} with some text",
                                (2 * i + 1) * FX.TICK, scale=6,
                                state=2 if i == 0 else 1))
    specs.append(FX.clear_ds(100 * FX.TICK))
    big_payload = FX.sup_payload(specs)
    assert len(big_payload) > 64 * 1024  # must exceed the lane threshold
    rows.append(("https://example.org/skew/big", 1, big_payload))
    for i in range(30):
        rows.append((f"https://example.org/skew/small/{i}", 2 + i,
                     FX.sup_payload([FX.text_ds(f"small {i}", FX.TICK),
                                     FX.clear_ds(2 * FX.TICK)])))
    return rows


def test_router_chunks_bounded_by_bytes(skewed_pages):
    from pgstosrt_ray.pipelines.extract import _demux_router
    from pgstosrt_ray.stages.demux import demux_batch
    pages = pa.table({
        "url": pa.array([r[0] for r in skewed_pages], pa.string()),
        "warc_ts": pa.array([r[1] for r in skewed_pages], pa.int64())
        .cast(pa.timestamp("us")),
        "html": pa.array([r[2] for r in skewed_pages], pa.binary()),
    })
    budget = 64 * 1024
    blocks = list(_demux_router(pages, block_bytes=budget))
    whole = demux_batch(pages)
    # row multiset preserved, order preserved (concatenation identity)
    assert pa.concat_tables(blocks).equals(whole)
    assert len(blocks) > 1  # the giant payload actually split
    for b in blocks:
        sizes = sum(len(bb) for row in b.column("bitmaps").to_pylist()
                    for bb in row)
        assert b.num_rows == 1 or sizes <= budget


def test_router_identity_random_batches():
    """Property: for any page batch and any byte budget, concatenating
    the router's yielded blocks reproduces demux_batch exactly."""
    from pgstosrt_ray.pipelines.extract import _demux_router
    from pgstosrt_ray.stages.demux import demux_batch
    rng = __import__("random").Random(11)
    for trial in range(10):
        rows = []
        t0 = 1_700_000_000_000_000
        for i in range(rng.randint(1, 6)):
            kind = rng.random()
            if kind < 0.2:
                payload = b"garbage not a stream %d" % i
            else:
                payload = FX.sup_payload(
                    [FX.text_ds(f"r{trial}c{i}", (i + 1) * FX.TICK,
                                scale=rng.choice([1, 1, 3]))])
            rows.append((f"https://e.org/{trial}/{i}", t0 + i, payload))
        pages = pa.table({
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.int64())
            .cast(pa.timestamp("us")),
            "html": pa.array([r[2] for r in rows], pa.binary()),
        })
        budget = rng.choice([1, 1024, 64 * 1024, 10 << 20])
        blocks = list(_demux_router(pages, block_bytes=budget))
        assert pa.concat_tables(blocks).equals(demux_batch(pages))


def test_skew_lane_byte_identical(ray_session, skewed_pages):
    import ray.data
    pages = pa.table({
        "url": pa.array([r[0] for r in skewed_pages], pa.string()),
        "warc_ts": pa.array([r[1] for r in skewed_pages], pa.int64())
        .cast(pa.timestamp("us")),
        "html": pa.array([r[2] for r in skewed_pages], pa.binary()),
    })
    ds = ray.data.from_arrow(pages)
    cfg = PipelineConfig(skew_block_bytes=64 * 1024, extract_concurrency=2)
    docs = {}
    for b in extract_docs(ds, cfg).iter_batches(batch_format="pyarrow"):
        for u, t, n in zip(b.column("url").to_pylist(),
                           b.column("text").to_pylist(),
                           b.column("n_cues").to_pylist()):
            docs[u] = (t, n)
    assert len(docs) == 31
    for url, ts, payload in skewed_pages:
        exp_text, exp_n = extract_url([(ts, payload)])
        assert docs[url] == (exp_text, exp_n), url
