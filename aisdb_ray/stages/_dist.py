"""Shared distributed-kernel shapes.

Two patterns recur across the engine's operators; they live here so the
partition-count sizing and combine policy have ONE definition:

- :func:`co_shuffle` — ONE hash-partition exchange on a key set, then one
  multi-group vectorized task per partition (never
  ``groupby(key).map_groups`` per tiny group: per-group invocation
  overhead dominates when groups are small — see stages/window.py).
- :func:`funnel_combine` — per-block vectorized combine of algebraic
  partials, then either a single-block funnel (results small by
  construction: top-k, mode, sketches) or a ``groupby(key)`` hash combine
  (the scale path when the result itself outgrows one block).  Policy
  rationale: stages/rollup.py `_combine` docstring.
"""

from __future__ import annotations

import pyarrow as pa

_PART = "_part"


def _default_parts() -> int:
    import ray

    return max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)


def co_shuffle(ds, keys: list[str], block_fn, num_parts: int | None = None):
    """Hash-partition ``ds`` by ``keys`` and run ``block_fn`` once per
    partition (the partition holds every row of each of its key groups)."""
    from aisdb_ray.stages.join import _key_hash

    if num_parts is None:
        num_parts = _default_parts()

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column(_PART, pa.array(_key_hash(b, keys, num_parts)))

    def per_part(part: pa.Table) -> pa.Table:
        return block_fn(part.drop_columns([_PART]))

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby(_PART)
        .map_groups(per_part, batch_format="pyarrow")
    )


def staged_manifest_meta(staging_dir: str, num_parts: int,
                         fingerprint: str | None,
                         keys: list[str] | None = None,
                         custom_part_fn: bool | None = None) -> dict | None:
    """Peek a persisted staged-exchange manifest: returns its ``extra``
    payload when one exists AND matches (num_parts, fingerprint) — and,
    when ``keys``/``custom_part_fn`` are given, the same route identity
    ``co_shuffle_staged``'s own resume check enforces (pass them unless
    your fingerprint already pins the route; serving ``extra`` from a
    checkpoint the exchange itself would reject would bake stale caller
    state into a rebuilt exchange).  Callers use this to skip work whose
    result the checkpoint already pins (e.g. ranksort's boundary
    sample)."""
    import json
    import os

    mpath = os.path.join(staging_dir, "_MANIFEST.json")
    if not os.path.exists(mpath):
        return None
    try:
        saved = json.load(open(mpath))
    except (OSError, ValueError):
        return None
    if not saved or saved.get("num_parts") != num_parts:
        return None
    if saved.get("fingerprint") != fingerprint:
        return None
    if keys is not None or custom_part_fn is not None:
        route = saved.get("route") or {}
        if keys is not None and route.get("keys") != list(keys):
            return None
        if (custom_part_fn is not None
                and route.get("custom_part_fn") != custom_part_fn):
            return None
    return saved.get("extra") or {}


def co_shuffle_staged(ds, keys: list[str], block_fn, staging_dir: str,
                      num_parts: int | None = None, part_fn=None,
                      part_aware: bool = False, resume: bool = False,
                      fingerprint: str | None = None,
                      extra: dict | None = None):
    """Disk-staged variant of :func:`co_shuffle` for big inputs: a map-only
    compressed-parquet exchange replaces the object-store sort — the
    cascade's scaling-proven hash exchange
    (stages/salted.clean_chunks_staged) generalized to any block kernel.

    ``part_fn(batch) -> int array`` overrides the hash partitioner (range
    exchanges pass searchsorted boundary ids).  ``part_aware=True`` calls
    ``block_fn(table, part_id, part_counts)`` where ``part_counts`` is the
    exact per-partition row-count vector from the exchange manifest — the
    global-offset input rank/sort kernels need (length ``num_parts``,
    tiny, captured by value in the phase-B closure).

    Phase A (map-only, scales linearly): each map task writes ONE shuffle
    file with one row group per destination partition, so file-creation
    cost stays O(map tasks) and phase-B readers prune to their partition
    via row-group statistics.  Phase B: one task per partition reads its
    row groups and runs ``block_fn`` over the whole partition.  Partition
    count comes from config, not cluster size — the work layout (and any
    resume plan above it) is cluster-size-invariant.

    Retry safety: phase-A writes are side effects, so a Ray task retry (or
    lineage reconstruction on a cluster) can re-run a write task.  Instead
    of trusting the directory listing, each write task RETURNS its stage
    file's name + row count; Ray delivers exactly one result per logical
    task regardless of how many attempts ran, so the collected manifest is
    exact.  Phase B reads ONLY manifest-listed files — orphan files from
    killed or duplicated attempts are ignored — and each file is written to
    a temp path and atomically renamed, so a half-written file can never
    carry a manifest name.  Footer row counts are validated against the
    manifest before phase B starts.

    The returned Dataset READS the stage files lazily: consume (or
    materialize) it before deleting ``staging_dir``.

    ``resume=True`` persists the phase-A manifest (as
    ``_MANIFEST.json``, written atomically AFTER every stage file is
    durable and footer-validated) and, on a rerun against the same
    ``staging_dir``, SKIPS phase A entirely when a manifest for the same
    (``num_parts``, ``keys``/part-fn marker, ``fingerprint``) is present
    — the all-to-all is the expensive half of the job, so a killed run
    restarts at phase B (the checkpointed-watermark posture of the
    cascade, extended to ad-hoc exchanges).

    ``fingerprint`` guards the checkpoint against silent input drift:
    pass a cheap identity of the input (source file list + row count, a
    config hash, ...) and a rerun whose fingerprint differs REBUILDS the
    exchange instead of serving the stale one.  ``extra`` is an opaque
    JSON-able payload stored alongside the manifest and retrievable via
    :func:`staged_manifest_meta` before calling (so callers can also
    skip work that only feeds phase A, e.g. boundary sampling)."""
    import json
    import os
    import shutil
    import uuid

    import numpy as np
    import pyarrow.parquet as pq

    import ray.data as rd
    from aisdb_ray.stages.join import _key_hash

    if num_parts is None:
        # FIXED default, not _default_parts(): the docstring's promise —
        # "partition count comes from config, not cluster size" — is what
        # makes a resume manifest written on an 8-cpu box match a rerun
        # on 32 cpus (salted.clean_chunks_staged pins 64 for the same
        # reason); a cluster-derived default silently rebuilt the whole
        # all-to-all across cluster sizes
        num_parts = 64
    mpath = os.path.join(staging_dir, "_MANIFEST.json")
    # route identity: which columns / partitioner shaped the exchange.
    # part_fn closures can't be hashed — callers pin them via fingerprint.
    route_id = {"keys": list(keys), "custom_part_fn": part_fn is not None}
    manifest = None
    if resume and os.path.exists(mpath):
        try:
            saved = json.load(open(mpath))
        except (OSError, ValueError):
            saved = None
        if (saved and saved.get("num_parts") == num_parts
                and saved.get("fingerprint") == fingerprint
                and saved.get("route", route_id) == route_id):
            manifest = saved["rows"]
    resumed_from_disk = manifest is not None
    if manifest is None:
        shutil.rmtree(staging_dir, ignore_errors=True)
        os.makedirs(staging_dir, exist_ok=True)

    def write_stage(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "part": pa.array([], pa.int64()),
                             "rg": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        sp = np.asarray(
            part_fn(b) if part_fn is not None else _key_hash(b, keys, num_parts)
        )
        order = np.argsort(sp, kind="stable")
        b2 = b.take(pa.array(order))
        sps = sp[order]
        bounds = np.r_[np.flatnonzero(np.r_[True, sps[1:] != sps[:-1]]), len(sps)]
        name = f"stage-{uuid.uuid4().hex[:12]}.parquet"
        path = os.path.join(staging_dir, name)
        tmp = path + ".tmp"
        # lz4: staging is transient (often tmpfs) — cheap CPU beats ratio
        with pq.ParquetWriter(tmp, b2.schema, compression="lz4") as w:
            for a, e in zip(bounds[:-1], bounds[1:]):
                w.write_table(b2.slice(a, e - a), row_group_size=e - a)
        os.replace(tmp, path)  # atomic: a manifest name is always complete
        rgs = np.arange(len(bounds) - 1, dtype=np.int64)
        return pa.table({
            "file": pa.array([name] * len(rgs), pa.string()),
            "part": pa.array(sps[bounds[:-1]].astype(np.int64), pa.int64()),
            "rg": pa.array(rgs, pa.int64()),
            "n": pa.array(np.diff(bounds).astype(np.int64), pa.int64()),
        })

    # the exchange barrier: every shuffle file durable before any read.
    # take_all() is one row per (map task, partition) — the manifest, not
    # the data.  Phase B reads EXACT (file, row group) pairs, so killed or
    # re-executed attempts can neither duplicate nor truncate a partition,
    # and no filter evaluation runs at read time.
    if manifest is None:
        manifest = ds.map_batches(write_stage,
                                  batch_format="pyarrow").take_all()
        if resume:
            tmp = mpath + ".tmp"
            with open(tmp, "w") as o:
                json.dump({"num_parts": num_parts,
                           "fingerprint": fingerprint,
                           "route": route_id,
                           "extra": extra,
                           "rows": [{"file": r["file"],
                                     "part": int(r["part"]),
                                     "rg": int(r["rg"]),
                                     "n": int(r["n"])} for r in manifest]},
                          o)
            os.replace(tmp, mpath)
    per_file: dict[str, int] = {}
    assign: dict[int, list] = {k: [] for k in range(num_parts)}
    part_counts = np.zeros(num_parts, dtype=np.int64)
    for r in manifest:
        per_file[r["file"]] = per_file.get(r["file"], 0) + int(r["n"])
        assign[int(r["part"])].append((r["file"], int(r["rg"])))
        part_counts[int(r["part"])] += int(r["n"])
    try:
        for f, n_expect in per_file.items():
            got = pq.read_metadata(os.path.join(staging_dir, f)).num_rows
            if got != n_expect:
                raise RuntimeError(
                    f"staged exchange file {f}: footer rows {got} != "
                    f"manifest {n_expect} (corrupt stage write)")
    except (OSError, RuntimeError, pa.ArrowInvalid):
        if not resumed_from_disk:
            raise  # a freshly built exchange failing validation is fatal
        # a RESUMED manifest pointing at missing/corrupt files: discard
        # the stale checkpoint and rebuild the exchange from scratch
        try:
            os.remove(mpath)
        except OSError:
            pass
        return co_shuffle_staged(ds, keys, block_fn, staging_dir,
                                 num_parts=num_parts, part_fn=part_fn,
                                 part_aware=part_aware, resume=resume,
                                 fingerprint=fingerprint, extra=extra)

    if not per_file:
        # entirely empty input: run the kernel once over an empty table with
        # the input schema instead of handing pyarrow an empty file list.
        base = ds.schema().base_schema
        if not isinstance(base, pa.Schema):
            # pandas-backed dataset: round-trip one (empty) block through
            # Arrow to recover a pa.Schema
            base = (ds.map_batches(lambda b: b, batch_format="pyarrow")
                    .schema().base_schema)
        empty = base.empty_table()
        out = (block_fn(empty, 0, part_counts) if part_aware
               else block_fn(empty))
        return rd.from_arrow(out)

    # schema for empty partitions: read it off any stage file footer once
    empty_schema = pq.read_schema(
        os.path.join(staging_dir, next(iter(per_file)))
    )

    def run_part(batch: pa.Table) -> pa.Table:
        # lease refresh: the returned Dataset reads lazily, possibly long
        # after phase A — touching the staging dir at read time keeps an
        # in-use exchange out of any mtime-based GC's reach
        try:
            os.utime(staging_dir, None)
        except OSError:
            pass
        out = []
        for part, fs, rgs in zip(batch["part"].to_pylist(),
                                 batch["files"].to_pylist(),
                                 batch["rgs"].to_pylist()):
            open_files: dict = {}
            pieces = []
            for f, rg in zip(fs, rgs):
                pf = open_files.get(f)
                if pf is None:
                    pf = open_files[f] = pq.ParquetFile(
                        os.path.join(staging_dir, f)
                    )
                pieces.append(pf.read_row_group(int(rg)))
            for pf in open_files.values():
                pf.close()
            if pieces:
                tbl = pa.concat_tables(pieces, promote_options="default")
            else:
                tbl = empty_schema.empty_table()
            out.append(block_fn(tbl, int(part), part_counts) if part_aware
                       else block_fn(tbl))
        return pa.concat_tables(out, promote_options="default")

    items = rd.from_items(
        [
            {"part": k, "files": [f for f, _ in assign[k]],
             "rgs": [rg for _, rg in assign[k]]}
            for k in range(num_parts)
        ],
        override_num_blocks=num_parts,
    )
    return items.map_batches(run_part, batch_format="pyarrow", batch_size=None)


def funnel_combine(partials, merge_fn, key_col: str | None = None,
                   hash_combine: bool = False, finalize_fn=None):
    """Combine algebraic partial blocks: local vectorized merge, then one
    global merge (single-block funnel, or hash shuffle on ``key_col`` when
    ``hash_combine``), then an optional finalize map."""
    local = partials.map_batches(merge_fn, batch_format="pyarrow", batch_size=None)
    if hash_combine:
        if key_col is None:
            raise ValueError("hash_combine requires key_col")
        merged = local.groupby(key_col).map_groups(merge_fn, batch_format="pyarrow")
    else:
        merged = local.repartition(1).map_batches(
            merge_fn, batch_format="pyarrow", batch_size=None
        )
    if finalize_fn is None:
        return merged
    return merged.map_batches(finalize_fn, batch_format="pyarrow", batch_size=None)
