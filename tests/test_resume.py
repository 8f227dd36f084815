"""Resume test (SURVEY §5.6): kill after K partitions, restart, assert
completed partitions aren't reprocessed and final output equals a
clean run."""

import pytest

from pgstosrt_ray.config import PipelineConfig
from pgstosrt_ray.sources.pages import materialize_corpus, read_golden
from pgstosrt_ray.state.checkpoint import (completed_partitions,
                                           partition_of, read_output,
                                           run_checkpointed)


@pytest.fixture(scope="module")
def small_dir():
    return materialize_corpus("tiny", 30, seed=7)


def _cfg():
    return PipelineConfig(num_partitions=8, extract_concurrency=2)


def test_clean_run_writes_all_partitions(ray_session, small_dir, tmp_path):
    out = str(tmp_path / "clean")
    metrics = run_checkpointed(small_dir, out, _cfg())
    assert metrics["skipped_partitions"] == 0
    got = read_output(out)
    golden = read_golden(small_dir)
    exp = dict(zip(golden.column("url").to_pylist(),
                   golden.column("text").to_pylist()))
    ours = dict(zip(got.column("url").to_pylist(),
                    got.column("text").to_pylist()))
    assert ours == exp


def test_kill_and_resume(ray_session, small_dir, tmp_path):
    out = str(tmp_path / "resume")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed(small_dir, out, _cfg(), fail_after_parts=3)
    done_before = completed_partitions(out)
    assert len(done_before) == 3

    metrics = run_checkpointed(small_dir, out, _cfg())
    assert metrics["skipped_partitions"] == 3
    # completed partitions were not rewritten: only the remainder
    assert metrics["written_partitions"] == 8 - 3

    got = read_output(out)
    golden = read_golden(small_dir)
    exp = dict(zip(golden.column("url").to_pylist(),
                   golden.column("text").to_pylist()))
    ours = dict(zip(got.column("url").to_pylist(),
                    got.column("text").to_pylist()))
    assert ours == exp  # resumed output equals a clean run


def test_partition_assignment_stable(ray_session):
    assert partition_of("https://example.org/x", 16) == \
        partition_of("https://example.org/x", 16)
    assert 0 <= partition_of("anything", 16) < 16


def test_run_manifest_has_stage_metrics(ray_session, small_dir, tmp_path):
    """SURVEY §4: the run manifest carries per-stage rows/s and task
    wall-time percentiles (p50/p99) — the 100 TB progress surface."""
    import json
    import os

    from pgstosrt_ray.state.checkpoint import run_checkpointed
    out = str(tmp_path / "out")
    run_checkpointed(small_dir, out)
    path = os.path.join(out, "_manifest", "_run.json")
    assert os.path.exists(path)
    run = json.load(open(path))
    assert run["written_partitions"] > 0
    stages = run["stages"]
    assert len(stages) >= 1
    for st in stages:
        for field in ("stage", "rows", "wall_p50_s", "wall_p99_s",
                      "rows_per_s", "n_blocks"):
            assert field in st, (st, field)
    # the extract stage must be among the reported stages
    assert any("xtract" in st["stage"] or "MapBatches" in st["stage"]
               for st in stages)
