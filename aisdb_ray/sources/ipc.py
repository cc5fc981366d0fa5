"""Arrow IPC (Feather v2 / stream) source for the token table.

The third lake wire format next to CSV (sources/csv.py) and JSONL
(sources/jsonl.py): the zero-parse binary format a native producer — the
analog of the reference's Rust receiver
(/root/reference/receiver/src/receiver.rs) — would emit.  Files decode
with pyarrow's own IPC reader (no row-level parsing to quarantine), so
the corruption contract moves up a level: a file that fails BOTH the
random-access (file) and streaming readers is quarantined WHOLE and the
read continues — skip-don't-crash at file granularity, mirroring the
decoder's skip-bad-rows posture (SURVEY §2.1 S1/S4).

Scale shape: ``ray.data.read_binary_files`` parallelizes at file
granularity and each file decodes zero-copy inside its map task; keep
files shard-sized (the writers here emit one file per input block).
"""

from __future__ import annotations

import io
import os

import pyarrow as pa

TOKEN_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("tokens", pa.list_(pa.int32())),
    ("n_tok", pa.int32()),
    ("source", pa.string()),
])

_EXTS = (".arrow", ".ipc", ".feather")


def write_token_ipc(parquet_dir: str, out_dir: str,
                    inject_garbage: bool = False) -> str:
    """Materialize the cached token parquet as Arrow IPC files (one per
    input file); ``inject_garbage`` ADDS undecodable files alongside the
    intact data (junk bytes, and a truncated copy of a real file) so the
    quarantine path is exercised while the decodable row set stays
    exactly the full table — the CSV source's injected-garbage contract
    at file granularity.  Idempotent via a _DONE marker."""
    import pyarrow.ipc as ipc
    import pyarrow.parquet as pq

    import shutil

    done = os.path.join(out_dir, "_DONE")
    marker = f"ok garbage={bool(inject_garbage)}"
    if os.path.exists(done):
        with open(done) as fh:
            prev = fh.read()
        if prev == marker:
            return out_dir
        # cached dir was built under the OTHER garbage contract — rebuild
        shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    # recursive discovery, same contract as the CSV/JSONL writers: a flat
    # listdir found zero files under nested part dirs (then stamped _DONE
    # over an empty fixture) and rejected single-file inputs outright
    from aisdb_ray.state.lineage import list_parquet_files

    files = list_parquet_files(parquet_dir)
    if not files:
        raise FileNotFoundError(
            f"write_token_ipc: no parquet files under {parquet_dir!r}"
        )
    last_data = b""
    for i, f in enumerate(files):
        tbl = pq.read_table(f).select(TOKEN_SCHEMA.names)
        tbl = tbl.cast(TOKEN_SCHEMA)
        buf = io.BytesIO()
        with ipc.new_file(buf, TOKEN_SCHEMA) as w:
            w.write_table(tbl)
        last_data = buf.getvalue()
        tmp = os.path.join(out_dir, f"part-{i:05d}.arrow.tmp")
        with open(tmp, "wb") as o:
            o.write(last_data)
        os.replace(tmp, os.path.join(out_dir, f"part-{i:05d}.arrow"))
    if inject_garbage:
        with open(os.path.join(out_dir, "junk-a.arrow"), "wb") as o:
            o.write(b"NOT AN ARROW FILE AT ALL \x00\x01\x02" * 64)
        with open(os.path.join(out_dir, "junk-b.arrow"), "wb") as o:
            o.write(last_data[: max(16, len(last_data) // 3)])
    with open(done, "w") as o:
        o.write(marker)
    return out_dir


def read_token_ipc(paths):
    """Parallel IPC read of the token-table shape -> Arrow-typed Dataset.

    Accepts a file, directory, or list of either; only ``.arrow`` /
    ``.ipc`` / ``.feather`` files are read (anything else in a directory
    is rejected up front — wrong-format inputs surface instead of being
    silently quarantined).  Undecodable files drop whole."""
    import ray.data as rd

    if isinstance(paths, (str, os.PathLike)):
        path_list = [str(paths)]
    else:
        path_list = [str(p) for p in paths]
    expanded = []
    for p in path_list:
        if os.path.isdir(p):
            for f in sorted(os.listdir(p)):
                fp = os.path.join(p, f)
                if f.endswith(_EXTS):
                    expanded.append(fp)
                elif os.path.isfile(fp) and not f.startswith("_"):
                    raise ValueError(
                        f"read_token_ipc: non-IPC file in input dir: {fp}")
        else:
            if not p.endswith(_EXTS):
                raise ValueError(f"read_token_ipc: not an IPC file: {p}")
            expanded.append(p)

    ds = rd.read_binary_files(expanded)

    def decode(batch: pa.Table) -> pa.Table:
        import pyarrow.ipc as ipc

        col = batch["bytes"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        outs = []
        for i in range(len(col)):
            # as_buffer(): zero-copy view into the Arrow value buffer —
            # to_pylist() would copy every multi-MB blob into Python bytes
            blob = col[i].as_buffer()
            tbl = None
            for opener in (ipc.open_file, ipc.open_stream):
                try:
                    with opener(pa.BufferReader(blob)) as r:
                        tbl = r.read_all()
                    break
                except (pa.ArrowInvalid, OSError):
                    # a truncated STREAM body surfaces as OSError from
                    # read_all (schema header opened fine) — quarantine
                    continue
            if tbl is None:
                continue  # quarantined whole file
            missing = set(TOKEN_SCHEMA.names) - set(tbl.schema.names)
            if missing:
                raise ValueError(
                    f"read_token_ipc: decodable IPC file lacks required "
                    f"columns {sorted(missing)} — wrong-format input"
                )
            outs.append(tbl.select(TOKEN_SCHEMA.names).cast(TOKEN_SCHEMA))
        if not outs:
            return TOKEN_SCHEMA.empty_table()
        return pa.concat_tables(outs, promote_options="default")

    return ds.map_batches(decode, batch_format="pyarrow")
