"""Per-partition checkpointing + resume (SURVEY §4/§7 step 6;
north_rule: "resumable from checkpoint with per-partition lineage +
metrics").

Layout (resumable output, ray_guide "Sources & sinks"):

    out_dir/
      part=K/data.parquet        # docs rows whose hash(url) % P == K
      _manifest/K.json           # lineage + metrics, written atomically

A partition is complete iff its manifest exists. Manifests are written
via temp-file + rename (atomic on POSIX), AFTER the data file, so a
crash can leave orphan data but never a manifest without data. On
restart the driver lists completed manifests and prefilters the input:
pages whose url hashes into a completed partition are skipped at the
READ (cheap map_batches filter), so finished work is never reparsed.

Partition id = sha1(url) % P: stable across runs and processes (no
Python hash()), independent of row order, and the SAME key as the
assembly groupby, so every url's output lands in exactly one partition.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq


def partition_of(url: str, num_partitions: int) -> int:
    return int.from_bytes(hashlib.sha1(url.encode()).digest()[:8],
                          "big") % num_partitions


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def completed_partitions(out_dir: str) -> set[int]:
    mdir = _manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for name in os.listdir(mdir):
        if name.endswith(".json"):
            try:
                out.add(int(name[:-5]))
            except ValueError:
                pass
    return out


def write_partition(out_dir: str, part_id: int, table: pa.Table,
                    metrics: dict | None = None) -> None:
    """Atomically write one partition's docs + manifest."""
    pdir = os.path.join(out_dir, f"part={part_id}")
    os.makedirs(pdir, exist_ok=True)
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    data_path = os.path.join(pdir, "data.parquet")
    tmp = data_path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, data_path)
    sha = hashlib.sha256()
    for url, text in zip(table.column("url").to_pylist(),
                         table.column("text").to_pylist()):
        sha.update(url.encode())
        sha.update(text.encode())
    manifest = {
        "part_id": part_id,
        "n_rows": table.num_rows,
        "n_bytes": os.path.getsize(data_path),
        "content_sha256": sha.hexdigest(),
        "wall_time_s": metrics.get("wall_time_s") if metrics else None,
        "written_at": time.time(),
    }
    fd, tmp_m = tempfile.mkstemp(dir=_manifest_dir(out_dir))
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp_m, os.path.join(_manifest_dir(out_dir),
                                   f"{part_id}.json"))


def stage_metrics(ds) -> list:
    """Per-stage operator metrics from an EXECUTED dataset's stats:
    rows/s plus task wall-time p50/p99 per pipeline stage (SURVEY §4's
    p99-in-the-manifest promise — the 100 TB operator's progress
    surface, analogue of the reference's per-50-items progress log,
    PgsOcr.cs:98-101). Walks the stats chain; returns [] when stats
    are unavailable (e.g. never executed)."""
    import numpy as np
    out, seen = [], set()

    def walk(st):
        if st is None or id(st) in seen:
            return
        seen.add(id(st))
        for p in (getattr(st, "parents", None) or []):
            walk(p)
        for name, blocks in (getattr(st, "metadata", None) or {}).items():
            walls = np.array([b.exec_stats.wall_time_s for b in blocks
                              if b.exec_stats is not None])
            rows = sum(b.num_rows or 0 for b in blocks)
            if not len(walls):
                continue
            out.append({
                "stage": name,
                "n_blocks": int(len(walls)),
                "rows": int(rows),
                "wall_p50_s": round(float(np.percentile(walls, 50)), 5),
                "wall_p99_s": round(float(np.percentile(walls, 99)), 5),
                "wall_max_s": round(float(walls.max()), 5),
                "wall_sum_s": round(float(walls.sum()), 5),
                "rows_per_s": (round(rows / walls.sum(), 1)
                               if walls.sum() else None),
            })

    try:
        walk(ds._plan.stats())
    except Exception:
        return []
    return out


def write_run_manifest(out_dir: str, run: dict) -> None:
    """Atomic run-level manifest (stage metrics + totals) alongside
    the per-partition manifests."""
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=_manifest_dir(out_dir))
    with os.fdopen(fd, "w") as f:
        json.dump(run, f, indent=1)
    os.replace(tmp, os.path.join(_manifest_dir(out_dir), "_run.json"))


def read_output(out_dir: str) -> pa.Table:
    """Read back all completed partitions as one table."""
    parts = []
    for part_id in sorted(completed_partitions(out_dir)):
        path = os.path.join(out_dir, f"part={part_id}", "data.parquet")
        parts.append(pq.read_table(path))
    if not parts:
        return pa.table({"url": pa.array([], pa.string()),
                         "text": pa.array([], pa.string()),
                         "n_cues": pa.array([], pa.int32())})
    return pa.concat_tables(parts)


def run_checkpointed(corpus: str, out_dir: str, cfg=None,
                     fail_after_parts: int | None = None) -> dict:
    """Run the extraction pipeline with per-partition checkpointing.

    Completed partitions (manifest present) are skipped: their urls are
    filtered out AT THE READ, so no demux/extract work happens for
    them. Remaining docs get a stable partition id and each partition
    is written atomically FROM THE WORKERS via
    ``groupby(_pid).map_groups`` (single-node sandbox: same filesystem;
    multi-node: out_dir is shared storage) — the driver only aggregates
    the returned manifest rows.

    ``fail_after_parts`` injects a crash after K newly-written
    partitions (resume test); that path collects driver-side so the
    failure point is deterministic. Returns run metrics.
    """
    import pyarrow.compute as pc

    from ..config import DEFAULT_CONFIG
    from ..pipelines.extract import extract_docs
    from ..sources.pages import read_pages

    cfg = cfg or DEFAULT_CONFIG
    num_parts = cfg.num_partitions
    done = completed_partitions(out_dir)
    t0 = time.perf_counter()

    def _pids_of(batch: pa.Table):
        # hash each unique url once, then gather (many rows share urls)
        import numpy as np
        import pandas as pd
        codes, uniques = pd.factorize(batch.column("url").to_pandas())
        per_unique = np.fromiter(
            (partition_of(u, num_parts) for u in uniques),
            dtype=np.int32, count=len(uniques))
        return per_unique[codes]

    pages = read_pages(corpus)
    if done:
        done_list = sorted(done)

        def keep(batch: pa.Table) -> pa.Table:
            import numpy as np
            mask = ~np.isin(_pids_of(batch), done_list)
            return batch.filter(pa.array(mask, pa.bool_()))

        pages = pages.map_batches(keep, batch_format="pyarrow")

    docs = extract_docs(pages, cfg)

    def add_pid(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_pid", pa.array(_pids_of(batch), pa.int32()))

    docs_pid = docs.map_batches(add_pid, batch_format="pyarrow")

    if fail_after_parts is not None:
        # deterministic failure injection: collect driver-side, write
        # partitions in order, crash after K
        buckets: dict[int, list[pa.Table]] = {}
        for batch in docs_pid.iter_batches(batch_format="pyarrow"):
            for pid in set(batch.column("_pid").to_pylist()):
                sub = batch.filter(pc.equal(batch.column("_pid"), pid))
                buckets.setdefault(pid, []).append(
                    sub.drop_columns(["_pid"]))
        written = 0
        wall = time.perf_counter() - t0
        for pid in sorted(buckets):
            table = pa.concat_tables(buckets[pid]).sort_by("url")
            write_partition(out_dir, pid, table,
                            metrics={"wall_time_s": round(wall, 3)})
            written += 1
            if written >= fail_after_parts:
                raise RuntimeError(
                    f"injected failure after {written} partitions")
        return {"written_partitions": written,
                "skipped_partitions": len(done),
                "wall_time_s": round(wall, 3)}

    def write_group(group: pa.Table) -> pa.Table:
        pid = group.column("_pid")[0].as_py()
        t_start = time.perf_counter()
        table = group.drop_columns(["_pid"]).sort_by("url")
        write_partition(out_dir, pid, table,
                        metrics={"wall_time_s":
                                 round(time.perf_counter() - t_start, 3)})
        return pa.table({"part_id": pa.array([pid], pa.int32()),
                         "n_rows": pa.array([table.num_rows], pa.int64())})

    mds = docs_pid.groupby("_pid").map_groups(
        write_group, batch_format="pyarrow")
    manifest_rows = mds.to_pandas()
    run = {"written_partitions": int(len(manifest_rows)),
           "skipped_partitions": len(done),
           "wall_time_s": round(time.perf_counter() - t0, 3)}
    # run-level manifest with per-stage rows/s + p50/p99 task times
    write_run_manifest(out_dir, {**run, "stages": stage_metrics(mds),
                                 "written_at": time.time()})
    return run
