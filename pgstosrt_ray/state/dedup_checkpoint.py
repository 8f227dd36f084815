"""Checkpoint/resume for the MinHash dedup pipeline (north_rule:
"resumable from checkpoint with per-partition lineage + metrics",
applied to the OTHER long-running 100 TB job besides extraction).

The two expensive stages persist independently, each with the same
atomic manifest pattern as the flagship (state/checkpoint.py):

    out_dir/
      sigs/part=K/data.parquet    # signature rows, sha-hash(doc_id)%P
      sigs/_manifest/K.json       # lineage + per-stage metrics
      pairs/grp=G/data.parquet    # candidate edges of salted group G
      pairs/_manifest/G.json

- Stage 1 (signatures) is the corpus-sized scan (shingle+minhash over
  every byte of text) — on resume, completed partitions are filtered
  out AT THE READ so their text is never re-scanned.
- Stage 2 (candidate pairing) shuffles tiny (band, key, doc_id) rows;
  on resume, completed salted groups are filtered out before the
  shuffle.
- The finish leg (signature re-join -> Jaccard estimate -> label
  propagation -> keepers) runs from the persisted artifacts; it is
  cheap relative to stage 1 and rebuilt on every run.

A stage partition/group is complete iff its manifest exists; manifests
are written atomically (temp + rename) AFTER the data file.
"""

from __future__ import annotations

import functools
import hashlib
import json
import os
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .checkpoint import completed_partitions


def _write_atomic(dir_path: str, part_id: int, table: pa.Table,
                  manifest_extra: dict) -> None:
    pdir = os.path.join(dir_path, f"part={part_id}")
    mdir = os.path.join(dir_path, "_manifest")
    os.makedirs(pdir, exist_ok=True)
    os.makedirs(mdir, exist_ok=True)
    data_path = os.path.join(pdir, "data.parquet")
    tmp = data_path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, data_path)
    manifest = {"part_id": part_id, "n_rows": table.num_rows,
                "n_bytes": os.path.getsize(data_path),
                "written_at": time.time(), **manifest_extra}
    fd, tmp_m = tempfile.mkstemp(dir=mdir)
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp_m, os.path.join(mdir, f"{part_id}.json"))


SIG_SCHEMA_VERSION = 1


def _stage_manifest(dir_path: str, expected: dict) -> dict:
    """Stage-level manifest guarding resume parameters: partition /
    group COUNTS (and schema version) are baked into the on-disk
    layout — resuming with a different count would remap
    doc_id -> pid / (band, key) -> grp and silently mis-filter (some
    partitions never processed, stale files from the old salting still
    read). Written atomically on first use; any later run with
    different parameters fails loudly instead."""
    os.makedirs(dir_path, exist_ok=True)
    path = os.path.join(dir_path, "_stage.json")
    if not os.path.exists(path) and completed_partitions(dir_path):
        # legacy checkpoint dir: completed partitions exist but no
        # _stage.json records which parameters produced them. Stamping
        # it with THIS call's parameters would silently accept a
        # mismatched resume — exactly the remap the manifest prevents.
        raise ValueError(
            f"checkpoint dir {dir_path} has completed partitions but "
            f"no _stage.json manifest (written by an older layout); "
            f"cannot verify it used the requested parameters "
            f"{expected}. Start a fresh out_dir.")
    if os.path.exists(path):
        with open(path) as f:
            have = json.load(f)
        clash = {k: (have.get(k), v) for k, v in expected.items()
                 if have.get(k) != v}
        if clash:
            raise ValueError(
                f"dedup checkpoint resume parameter mismatch under "
                f"{dir_path}: {clash} (existing vs requested). Resume "
                f"with the original parameters or start a fresh "
                f"out_dir.")
        return have
    fd, tmp = tempfile.mkstemp(dir=dir_path)
    with os.fdopen(fd, "w") as f:
        json.dump(expected, f)
    os.replace(tmp, path)
    return expected


def _read_stage(dir_path: str) -> dict | None:
    path = os.path.join(dir_path, "_stage.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _pid_of_ids(ids, parts: int):
    """Stable partition id per doc_id (sha1 of the decimal id — no
    process hashing, identical across runs/processes)."""
    import numpy as np
    return np.fromiter(
        (int.from_bytes(hashlib.sha1(str(int(i)).encode()).digest()[:8],
                        "big") % parts for i in ids),
        dtype=np.int32, count=len(ids))


def _checkpoint_sig_stage(sf_dir: str, sig_dir: str, sig_batch_fn,
                          parts: int, fail_after: int | None,
                          stage_params: dict, read_fn=None) -> dict:
    """Generic stage-1 machinery: persist a per-doc signature table
    partition-by-partition (sha1(doc_id) % parts), skipping completed
    partitions AT THE READ. ``sig_batch_fn(source_batch) -> Table``
    must emit a ``doc_id`` column; ``read_fn(sf_dir)`` supplies the
    source Dataset (documents by default). Everything else (atomic
    data+manifest writes, resume filter, parameter guard) is
    family-independent."""
    import pyarrow.compute as pc

    from ..pipelines.dedupe import _read_docs

    _stage_manifest(sig_dir, {"parts": parts, **stage_params})
    done = completed_partitions(sig_dir)
    t0 = time.perf_counter()

    def sig_with_pid(batch: pa.Table) -> pa.Table:
        t = sig_batch_fn(batch)
        return t.append_column(
            "_pid", pa.array(_pid_of_ids(t.column("doc_id").to_pylist(),
                                         parts), pa.int32()))

    ds = (read_fn or _read_docs)(sf_dir)
    if done:
        done_list = sorted(done)

        def keep(batch: pa.Table) -> pa.Table:
            import numpy as np
            pids = _pid_of_ids(batch.column("doc_id").to_pylist(), parts)
            mask = ~np.isin(pids, done_list)
            return batch.filter(pa.array(mask, pa.bool_()))

        ds = ds.map_batches(keep, batch_format="pyarrow")

    sig_ds = ds.map_batches(sig_with_pid, batch_format="pyarrow",
                            batch_size=256)

    if fail_after is not None:
        # deterministic failure injection: collect + write in order,
        # crash after K new partitions (test path)
        buckets: dict[int, list[pa.Table]] = {}
        for batch in sig_ds.iter_batches(batch_format="pyarrow"):
            for pid in set(batch.column("_pid").to_pylist()):
                sub = batch.filter(pc.equal(batch.column("_pid"), pid))
                buckets.setdefault(pid, []).append(sub.drop_columns(["_pid"]))
        written = 0
        for pid in sorted(buckets):
            tab = pa.concat_tables(buckets[pid]).sort_by("doc_id")
            _write_atomic(sig_dir, pid, tab, {"stage": "signatures"})
            written += 1
            if written >= fail_after:
                raise RuntimeError(
                    f"injected failure after {written} sig partitions")
        return {"written": written, "skipped": len(done)}

    def write_group(group: pa.Table) -> pa.Table:
        pid = group.column("_pid")[0].as_py()
        t_start = time.perf_counter()
        tab = group.drop_columns(["_pid"]).sort_by("doc_id")
        _write_atomic(sig_dir, pid, tab, {
            "stage": "signatures",
            "wall_time_s": round(time.perf_counter() - t_start, 4)})
        return pa.table({"part_id": pa.array([pid], pa.int32())})

    n_written = sig_ds.groupby("_pid").map_groups(
        write_group, batch_format="pyarrow").count()
    return {"written": int(n_written), "skipped": len(done),
            "wall_time_s": round(time.perf_counter() - t0, 3)}


def checkpoint_signatures(sf_dir: str, out_dir: str, parts: int = 16,
                          fail_after: int | None = None) -> dict:
    """MinHash stage 1: persist the signature table partition-by-
    partition, skipping completed partitions at the read."""
    from ..pipelines.dedupe import _minhash_sig_batch
    return _checkpoint_sig_stage(
        sf_dir, os.path.join(out_dir, "sigs"), _minhash_sig_batch,
        parts, fail_after,
        {"sig_schema_version": SIG_SCHEMA_VERSION})


def checkpoint_simhash_signatures(sf_dir: str, out_dir: str,
                                  parts: int = 16,
                                  fail_after: int | None = None) -> dict:
    """SimHash stage 1: persist (doc_id, simhash, band0..3) with the
    same partitioned atomic-manifest layout as MinHash."""
    from ..pipelines import dedupe

    def sig(batch: pa.Table) -> pa.Table:
        hs = np.array(
            [dedupe.simhash64(dedupe.word_ngram_hashes(t, n=1))
             for t in batch.column("text").to_pylist()],
            dtype=np.uint64)
        cols = {"doc_id": batch.column("doc_id").cast(pa.int64()),
                "simhash": pa.array(hs.astype(np.int64), pa.int64())}
        for b in range(4):
            cols[f"band{b}"] = pa.array(
                ((hs >> np.uint64(16 * b)) & np.uint64(0xFFFF))
                .astype(np.int64), pa.int64())
        return pa.table(cols, schema=dedupe.SIMHASH_SCHEMA)

    return _checkpoint_sig_stage(
        sf_dir, os.path.join(out_dir, "sigs"), sig, parts, fail_after,
        {"family": "simhash",
         "sig_schema_version": SIG_SCHEMA_VERSION})


def _checkpoint_pair_stage(out_dir: str, explode_fn, pairs_fn,
                           groups: int, fail_after: int | None,
                           stage_params: dict) -> dict:
    """Generic stage 2: candidate-pair edges per salted shuffle group,
    persisted group-by-group from the checkpointed signature table;
    completed groups are filtered before the shuffle.
    ``explode_fn(sig_table) -> Table`` must emit a ``grp`` column;
    ``pairs_fn(group_frame) -> DataFrame`` builds the group's edges."""
    import pyarrow.compute as pc
    import ray.data

    sig_dir = os.path.join(out_dir, "sigs")
    pair_dir = os.path.join(out_dir, "pairs")
    sig_stage = _read_stage(sig_dir)
    sig_done = completed_partitions(sig_dir)
    # stage-1 must be COMPLETE (all recorded partitions), not merely
    # started: pairing from partial signatures would permanently mark
    # pair groups done with missing candidates, and later resumes
    # would skip them
    if sig_stage is None or len(sig_done) != sig_stage["parts"]:
        have = len(sig_done)
        want = sig_stage["parts"] if sig_stage else "unknown"
        raise RuntimeError(
            f"checkpoint_pairs: signature stage incomplete under "
            f"{sig_dir} ({have}/{want} partitions); run "
            f"checkpoint_signatures to completion first")
    _stage_manifest(pair_dir, {"groups": groups,
                               "sig_parts": sig_stage["parts"],
                               **stage_params})
    done = completed_partitions(pair_dir)
    t0 = time.perf_counter()
    sigs = ray.data.read_parquet(os.path.join(sig_dir))
    buckets = sigs.map_batches(explode_fn, batch_format="pyarrow")
    if done:
        done_arr = pa.array(sorted(done), pa.int32())
        buckets = buckets.map_batches(
            lambda t: t.filter(pc.invert(pc.is_in(t.column("grp"),
                                                  value_set=done_arr))),
            batch_format="pyarrow")

    if fail_after is not None:
        import pandas as pd
        parts: dict[int, list] = {}
        for batch in buckets.iter_batches(batch_format="pandas"):
            for grp, sub in batch.groupby("grp"):
                parts.setdefault(int(grp), []).append(sub)
        written = 0
        for grp in sorted(parts):
            g = pd.concat(parts[grp], ignore_index=True)
            pairs = pairs_fn(g)
            _write_atomic(pair_dir, grp,
                          pa.Table.from_pandas(pairs, preserve_index=False),
                          {"stage": "pairs"})
            written += 1
            if written >= fail_after:
                raise RuntimeError(
                    f"injected failure after {written} pair groups")
        return {"written": written, "skipped": len(done)}

    def write_group(g) -> pa.Table:
        grp = int(g["grp"].iloc[0])
        t_start = time.perf_counter()
        pairs = pairs_fn(g)
        n = len(pairs)
        _write_atomic(pair_dir, grp,
                      pa.Table.from_pandas(pairs, preserve_index=False), {
                          "stage": "pairs", "n_input_rows": len(g),
                          "wall_time_s":
                          round(time.perf_counter() - t_start, 4)})
        import pandas as pd
        return pd.DataFrame({"grp": [grp], "n_pairs": [n]})

    # NOTE: even empty groups write a manifest, so resume knows they
    # are done (an absent manifest means "not attempted", never
    # "attempted, no pairs")
    stats = buckets.groupby("grp").map_groups(
        write_group, batch_format="pandas").count()
    return {"written": int(stats), "skipped": len(done),
            "wall_time_s": round(time.perf_counter() - t0, 3)}


def checkpoint_pairs(out_dir: str, groups: int = 32,
                     fail_after: int | None = None) -> dict:
    """MinHash stage 2: candidate-pair edges per salted (band, key)
    shuffle group."""
    from ..pipelines.dedupe import _bucket_pairs, _explode_minhash_bands
    return _checkpoint_pair_stage(
        out_dir,
        functools.partial(_explode_minhash_bands, groups=groups),
        _bucket_pairs, groups, fail_after, {})


def checkpoint_simhash_pairs(out_dir: str, groups: int = 32,
                             max_hamming: int = 3,
                             fail_after: int | None = None) -> dict:
    """SimHash stage 2: Hamming-verified candidate edges per salted
    (band, key) group; max_hamming is part of the resume contract (a
    different threshold would permanently mark groups done with the
    wrong edge set)."""
    from ..pipelines.dedupe import (_explode_simhash_bands,
                                    _simhash_band_pairs)
    return _checkpoint_pair_stage(
        out_dir,
        functools.partial(_explode_simhash_bands, groups=groups),
        functools.partial(_simhash_band_pairs, max_hamming=max_hamming),
        groups, fail_after, {"max_hamming": max_hamming})


def _nonempty_pair_files(out_dir: str) -> list[str]:
    pair_files = [
        os.path.join(out_dir, "pairs", d, "data.parquet")
        for d in sorted(os.listdir(os.path.join(out_dir, "pairs")))
        if d.startswith("part=")]
    return [p for p in pair_files
            if pq.ParquetFile(p).metadata.num_rows]


def _labels_cached(labels_dir: str, params: dict, build_fn):
    """Converged cluster LABELS with the atomic-manifest pattern: a
    resumed run reads them back instead of re-running the propagation
    rounds (at 100 TB each round is a join + bucketed min over the
    edge list — the expensive part of the finish leg). ``params`` are
    recorded in the stage manifest; a mismatched resume (different
    threshold / max_hamming) fails loudly instead of serving stale
    labels. Labels persist DISTRIBUTED (write_parquet into a temp dir,
    atomic rename, manifest last) — the label table is corpus-sized,
    it must never collect on the driver."""
    import shutil

    import ray.data

    have_labels = (_read_stage(labels_dir) is not None
                   and completed_partitions(labels_dir))
    _stage_manifest(labels_dir, params)
    if have_labels:
        return ray.data.read_parquet(os.path.join(labels_dir, "part=0"))
    labels = build_fn().materialize()
    data_dir = os.path.join(labels_dir, "part=0")
    tmp_dir = data_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    labels.write_parquet(tmp_dir)
    if os.path.isdir(data_dir):
        shutil.rmtree(data_dir)
    os.replace(tmp_dir, data_dir)
    mdir = os.path.join(labels_dir, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    fd, tmp_m = tempfile.mkstemp(dir=mdir)
    with os.fdopen(fd, "w") as f:
        json.dump({"part_id": 0, "stage": "labels",
                   "written_at": time.time()}, f)
    os.replace(tmp_m, os.path.join(mdir, "0.json"))
    return labels


def _keepers_of(labels):
    import pyarrow.compute as pc

    def keepers(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("doc_id"), t.column("cluster_id"))
        return t.filter(keep).select(["doc_id"])

    return labels.map_batches(keepers, batch_format="pyarrow")


def _emb_tables() -> int:
    from ..pipelines.dedupe import EMB_TABLES
    return EMB_TABLES


def _read_embeddings_as_docs(sf_dir: str):
    """embeddings table with vec_id presented as doc_id, so the
    generic stage machinery (sha1(doc_id) partitioning, resume
    filter) applies unchanged."""
    import ray.data
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return ds.map_batches(
        lambda t: t.rename_columns(["doc_id", "embedding"]),
        batch_format="pyarrow")


def checkpoint_embedding_signatures(sf_dir: str, out_dir: str,
                                    parts: int = 16,
                                    fail_after: int | None = None
                                    ) -> dict:
    """Embedding-LSH stage 1: persist ONE row per vector —
    (doc_id, embedding, b0..b5 hyperplane buckets) — instead of the
    pipeline's 6x-exploded band rows (6x less checkpoint storage; the
    explode is recomputed cheaply at stage 2)."""
    from ..pipelines import dedupe

    def sig(batch: pa.Table) -> pa.Table:
        stage = dedupe.EmbeddingBucketStage(groups=1)
        bucket = stage.bucket_matrix(batch)
        cols = {"doc_id": batch.column("doc_id").cast(pa.int64()),
                "embedding": batch.column("embedding")}
        for tb in range(stage.tables):
            cols[f"b{tb}"] = pa.array(bucket[:, tb], pa.int64())
        return pa.table(cols)

    return _checkpoint_sig_stage(
        sf_dir, os.path.join(out_dir, "sigs"), sig, parts, fail_after,
        {"family": "embedding", "tables": _emb_tables(),
         "sig_schema_version": SIG_SCHEMA_VERSION},
        read_fn=_read_embeddings_as_docs)


def checkpoint_embedding_pairs(out_dir: str, groups: int = 32,
                               threshold: float = 0.35,
                               fail_after: int | None = None) -> dict:
    """Embedding-LSH stage 2: cosine-verified pairs per salted
    (table, bucket) cell group from the persisted signatures;
    threshold is part of the resume contract."""
    from ..pipelines import dedupe

    n_tables = _emb_tables()

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        tab = np.tile(np.arange(n_tables, dtype=np.int32), n)
        key = np.empty(n_tables * n, dtype=np.int64)
        for tb in range(n_tables):
            key[tb::n_tables] = t.column(f"b{tb}").to_numpy()
        take = pa.array(np.repeat(np.arange(n), n_tables))
        return pa.table({
            "grp": pa.array(dedupe.salt_bucket(tab, key, groups),
                            pa.int32()),
            "tbl": pa.array(tab, pa.int32()),
            "bucket": pa.array(key, pa.int64()),
            "vec_id": t.column("doc_id").take(take),
            "embedding": t.column("embedding").combine_chunks()
            .take(take),
        })

    import functools as ft
    return _checkpoint_pair_stage(
        out_dir, explode,
        ft.partial(dedupe._embedding_cell_pairs, threshold=threshold),
        groups, fail_after, {"threshold": threshold})


def finish_embedding_pairs(out_dir: str):
    """Finish leg: the persisted cell pairs dedup to one (doc_a,
    doc_b, max cosine) row per pair (a pair can collide in several
    tables). Cheap relative to stage 2; rebuilt each run."""
    import ray.data

    from ..pipelines.dedupe import bucketed_group_agg
    from ..pipelines.reduce import buckets_for
    nonempty = _nonempty_pair_files(out_dir)
    if not nonempty:
        return ray.data.from_arrow(pa.table(
            {"doc_a": pa.array([], pa.int64()),
             "doc_b": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}))
    return bucketed_group_agg(
        ray.data.read_parquet(nonempty), ["doc_a", "doc_b"],
        lambda g: g.groupby(["doc_a", "doc_b"], as_index=False)
        ["cosine"].max(),
        buckets=buckets_for(est_bytes=sum(
            os.path.getsize(p) for p in nonempty)))


def run_checkpointed_embedding_near_dup(
        sf_dir: str, out_dir: str, threshold: float = 0.35,
        sig_parts: int = 16, pair_groups: int = 32,
        fail_after_sig_parts: int | None = None,
        fail_after_pair_groups: int | None = None):
    """End-to-end resumable embedding near-dup: returns ((doc_a,
    doc_b, cosine) Dataset, run metrics)."""
    m1 = checkpoint_embedding_signatures(
        sf_dir, out_dir, parts=sig_parts,
        fail_after=fail_after_sig_parts)
    m2 = checkpoint_embedding_pairs(
        out_dir, groups=pair_groups, threshold=threshold,
        fail_after=fail_after_pair_groups)
    return finish_embedding_pairs(out_dir), {"signatures": m1,
                                             "pairs": m2}


def run_checkpointed_prep_corpus(sf_dir: str, out_dir: str,
                                 buckets: int = 32,
                                 fail_after: int | None = None):
    """Resumable prep_corpus composition (normalize -> quality gate ->
    exact dedup -> split; pipelines/extended.q_prep_corpus): the
    checkpoint unit is the DEDUP BUCKET fp[:8] % buckets — each bucket
    is independently complete (every fingerprint lands in exactly one
    bucket, so its keeper set never depends on other buckets). On
    resume, completed buckets are filtered out BEFORE the shuffle;
    the narrow normalize/gate scan recomputes (it is what derives the
    bucket id), exactly like the pair stages recompute their explode.
    Returns ((doc_id, split) Dataset, metrics)."""
    import functools

    import pyarrow.compute as pc
    import ray.data

    from ..pipelines.extended import prep_keep_first, prep_stage1

    pdir = os.path.join(out_dir, "prep")
    _stage_manifest(pdir, {"buckets": buckets})
    done = completed_partitions(pdir)
    t0 = time.perf_counter()
    from ..pipelines.dedupe import _read_docs
    tagged = _read_docs(sf_dir).map_batches(
        functools.partial(prep_stage1, B=buckets),
        batch_format="pandas")
    if done:
        done_arr = pa.array(sorted(done), pa.int32())
        tagged = tagged.map_batches(
            lambda t: t.filter(pc.invert(pc.is_in(t.column("_b"),
                                                  value_set=done_arr))),
            batch_format="pyarrow")

    if fail_after is not None:
        import pandas as pd
        parts: dict[int, list] = {}
        for batch in tagged.iter_batches(batch_format="pandas"):
            for b, sub in batch.groupby("_b"):
                parts.setdefault(int(b), []).append(sub)
        written = 0
        for b in sorted(parts):
            g = pd.concat(parts[b], ignore_index=True)
            out = prep_keep_first(g)
            _write_atomic(pdir, b,
                          pa.Table.from_pandas(out, preserve_index=False),
                          {"stage": "prep_corpus"})
            written += 1
            if written >= fail_after:
                raise RuntimeError(
                    f"injected failure after {written} prep buckets")
        metrics = {"written": written, "skipped": len(done)}
    else:
        def write_group(g) -> "pd.DataFrame":
            import pandas as pd
            b = int(g["_b"].iloc[0])
            t_start = time.perf_counter()
            out = prep_keep_first(g)
            _write_atomic(pdir, b,
                          pa.Table.from_pandas(out, preserve_index=False),
                          {"stage": "prep_corpus", "n_input_rows": len(g),
                           "wall_time_s":
                           round(time.perf_counter() - t_start, 4)})
            return pd.DataFrame({"_b": [b], "n": [len(out)]})

        n = tagged.groupby("_b").map_groups(
            write_group, batch_format="pandas").count()
        metrics = {"written": int(n), "skipped": len(done),
                   "wall_time_s": round(time.perf_counter() - t0, 3)}
    # NOTE: buckets with NO surviving rows still write data+manifest
    # (possibly empty tables), so resume knows they are done
    part_files = [os.path.join(pdir, d, "data.parquet")
                  for d in sorted(os.listdir(pdir))
                  if d.startswith("part=")]
    nonempty = [p for p in part_files
                if pq.ParquetFile(p).metadata.num_rows]
    if not nonempty:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "split": pa.array([], pa.string())})
        return ray.data.from_arrow(empty), metrics
    return ray.data.read_parquet(nonempty), metrics


def finish_dedup_keep(sf_dir: str, out_dir: str,
                      threshold: float = 0.5):
    """MinHash finish leg from persisted artifacts: distinct candidate
    ids -> signature re-join + Jaccard estimate -> label propagation ->
    surviving doc_ids. Returns a Dataset."""
    import ray.data

    from ..pipelines import dedupe

    def build():
        sigs = ray.data.read_parquet(os.path.join(out_dir, "sigs"))
        sigs = sigs.select_columns(["doc_id", "sig"]).materialize()
        nonempty = _nonempty_pair_files(out_dir)
        ids = dedupe._read_docs(sf_dir).select_columns(["doc_id"])
        if not nonempty:
            return ids.map_batches(
                lambda t: pa.table({"doc_id": t.column("doc_id"),
                                    "cluster_id": t.column("doc_id")}),
                batch_format="pyarrow")
        from ..pipelines.reduce import buckets_for
        cand = dedupe._materialize_nonempty(dedupe._distinct_pairs(
            ray.data.read_parquet(nonempty),
            buckets=buckets_for(est_bytes=sum(
                os.path.getsize(p) for p in nonempty))))
        verified = dedupe.estimate_pairs(cand, sigs, threshold)
        edges = dedupe._materialize_nonempty(dedupe._edges_of(verified))
        return dedupe.label_propagation(edges, ids)

    labels = _labels_cached(os.path.join(out_dir, "labels"),
                            {"threshold": threshold}, build)
    return _keepers_of(labels)


def finish_simhash_clusters(sf_dir: str, out_dir: str,
                            max_hamming: int = 3):
    """SimHash finish leg from persisted artifacts: the pair files are
    already Hamming-verified edges, so the leg is one bucketed
    (doc_a, doc_b) dedup + label propagation. Returns the full
    (doc_id, cluster_id) Dataset (mirrors dedupe.simhash_dedup_clusters)."""
    import ray.data

    from ..pipelines import dedupe

    def build():
        nonempty = _nonempty_pair_files(out_dir)
        ids = dedupe._read_docs(sf_dir).select_columns(["doc_id"])
        if not nonempty:
            return ids.map_batches(
                lambda t: pa.table({"doc_id": t.column("doc_id"),
                                    "cluster_id": t.column("doc_id")}),
                batch_format="pyarrow")
        from ..pipelines.reduce import buckets_for
        pair_ds = ray.data.read_parquet(nonempty).map_batches(
            lambda t: t.select(["doc_a", "doc_b"]),
            batch_format="pyarrow")
        cand = dedupe._materialize_nonempty(dedupe._distinct_pairs(
            pair_ds,
            buckets=buckets_for(est_bytes=sum(
                os.path.getsize(p) for p in nonempty))))
        edges = dedupe._materialize_nonempty(dedupe._edges_of(cand))
        return dedupe.label_propagation(edges, ids)

    return _labels_cached(os.path.join(out_dir, "labels"),
                          {"max_hamming": max_hamming}, build)


def run_checkpointed_simhash(sf_dir: str, out_dir: str,
                             max_hamming: int = 3, sig_parts: int = 16,
                             pair_groups: int = 32,
                             fail_after_sig_parts: int | None = None,
                             fail_after_pair_groups: int | None = None):
    """End-to-end resumable SimHash clustering: returns
    ((doc_id, cluster_id) Dataset, run metrics). Re-running after a
    crash skips completed signature partitions and pair groups."""
    m1 = checkpoint_simhash_signatures(sf_dir, out_dir, parts=sig_parts,
                                       fail_after=fail_after_sig_parts)
    m2 = checkpoint_simhash_pairs(out_dir, groups=pair_groups,
                                  max_hamming=max_hamming,
                                  fail_after=fail_after_pair_groups)
    labels = finish_simhash_clusters(sf_dir, out_dir, max_hamming)
    return labels, {"signatures": m1, "pairs": m2}


def run_checkpointed_dedup(sf_dir: str, out_dir: str,
                           threshold: float = 0.5, sig_parts: int = 16,
                           pair_groups: int = 32,
                           fail_after_sig_parts: int | None = None,
                           fail_after_pair_groups: int | None = None):
    """End-to-end resumable MinHash dedup: returns (keepers Dataset,
    run metrics). Re-running after a crash skips completed signature
    partitions and pair groups."""
    m1 = checkpoint_signatures(sf_dir, out_dir, parts=sig_parts,
                               fail_after=fail_after_sig_parts)
    m2 = checkpoint_pairs(out_dir, groups=pair_groups,
                          fail_after=fail_after_pair_groups)
    keep = finish_dedup_keep(sf_dir, out_dir, threshold)
    return keep, {"signatures": m1, "pairs": m2}
