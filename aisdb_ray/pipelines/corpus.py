"""Resumable training-corpus build — the documents-side flagship.

The token cascade (pipelines/cascade.py) proves the resume machinery on
the time-series lake; this pipeline applies the SAME architecture to the
corpus last mile (the composition hash-verified live as
q_doc_training_pipeline): PII scrub → quality gate → exact dedup
keep-first by content hash → language tag → overlapping codepoint chunks,
materialized as partitioned parquet with per-partition lineage so a
killed ``ray job submit`` run resumes without recomputing completed
partitions.

Layout / resume contract (mirrors the cascade):
- ONE map-only routing pass (read → scrub → gate → content hash) writes a
  hive layout partitioned by ``part = md5(text_md5) % num_parts`` — the
  CONTENT hash, so every copy of a duplicate document lands in the same
  partition and per-partition keep-first dedup is globally exact.  The
  routing pass is atomic (tmp dir + rename) and recorded in the manifest;
  a killed run that finished routing never re-reads the input lake.
- one task per partition (driver thread pool, each thread running
  vectorized pyarrow work exactly like cascade._run_part): dedup →
  langid → chunk → atomic ``chunks/part=K`` write + manifest record.
  Completed partitions are skipped on resume; a changed input fingerprint
  invalidates the whole manifest (never mixes inputs).

Reference analog: the decoder's checksum ledger + PK-idempotent inserts
(/root/reference/aisdb/database/decoder.py:21-116) — file-granular resume
restated at hash-partition granularity.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from aisdb_ray.state import lineage

WRITE_ARGS = {"compression": "zstd"}


@dataclass
class CorpusConfig:
    input_path: str
    out_root: str
    num_parts: int = 16
    chunk_chars: int = 120
    overlap: int = 24
    quality_min: float = 0.75
    min_words: int = 20
    patterns: list = field(default_factory=list)  # (name, regex, repl)
    max_concurrent_parts: int = 4

    def fingerprint_extra(self) -> dict:
        return {
            "num_parts": self.num_parts,
            "chunk_chars": self.chunk_chars,
            "overlap": self.overlap,
            "quality_min": self.quality_min,
            "min_words": self.min_words,
            "patterns": [list(p) for p in self.patterns],
        }


def _route(cfg: CorpusConfig, manifest: lineage.Manifest,
           files: list[str]) -> None:
    """Map-only scrub → gate → content-hash routing pass (atomic).

    ``files`` is the listing run_corpus already fingerprinted — re-listing
    here would open a race where a file added/removed between the two
    walks makes the routed output disagree with the recorded fingerprint
    (besides duplicating the directory walk)."""
    import ray.data as rd

    from aisdb_ray.stages import scrub as scrub_mod
    from aisdb_ray.stages import textstats
    from aisdb_ray.stages.sample import md5_u32

    if manifest.done("route", "all"):
        return
    t0 = time.time()
    ds = rd.read_parquet(files, columns=["doc_id", "text"])
    if cfg.patterns:
        ds = scrub_mod.scrub(ds, "text", cfg.patterns)

    qmin, wmin, nparts = cfg.quality_min, cfg.min_words, cfg.num_parts

    def gate(b: pa.Table) -> pa.Table:
        q = textstats.quality_batch(b)
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(q["quality_score"], pa.scalar(qmin)),
                pc.greater_equal(q["n_words"], pa.scalar(wmin, pa.int64())),
            ),
            pc.greater(q["n_chars"], pa.scalar(0, pa.int64())),
        )
        # filter BEFORE hashing: md5_batch encodes every text and would
        # crash on the null rows this gate exists to drop
        b = b.filter(pc.fill_null(keep, False))
        b = textstats.md5_batch(b)
        part = md5_u32(b["text_md5"]) % nparts
        return b.append_column("part", pa.array(part, pa.int64()))

    routed = ds.map_batches(gate, batch_format="pyarrow")
    out = os.path.join(cfg.out_root, "route")
    with lineage.atomic_write(out) as tmp:
        routed.write_parquet(tmp, partition_cols=["part"], **WRITE_ARGS)
    manifest.record("route", "all", wall_s=round(time.time() - t0, 3))


def _run_part(cfg: CorpusConfig, manifest: lineage.Manifest,
              part: int) -> None:
    """Dedup → langid → chunk for one content-hash partition (the resume
    unit; vectorized pyarrow on the part's thread, cascade._run_part
    style)."""
    from aisdb_ray.functions import text as T
    from aisdb_ray.stages.scrub import chunk_table

    if manifest.done("chunks", part):
        return
    t0 = time.time()
    pdir = os.path.join(cfg.out_root, "route", f"part={part}")
    out = os.path.join(cfg.out_root, "chunks", f"part={part}")
    files = lineage.list_parquet_files(pdir) if os.path.isdir(pdir) else []
    if not files:
        os.makedirs(out, exist_ok=True)
        manifest.record("chunks", part, rows=0, wall_s=0.0)
        return
    b = pq.read_table(files, columns=["doc_id", "text", "text_md5"])
    # keep-first dedup by content hash: every copy routed here, so a
    # partition-local pass is globally exact.  Hash-factorize both key
    # columns to int codes first — an object-dtype lexsort over hex
    # digests is the exact 33x-slower pattern functions/codes.py exists
    # to avoid, and the old int64 cast crashed on string doc_ids.
    from aisdb_ray.functions.codes import factorize_sorted

    md5s_raw = b["text_md5"].to_numpy(zero_copy_only=False)
    _, md5s = factorize_sorted(md5s_raw)
    ids_raw = b["doc_id"].to_numpy(zero_copy_only=False)
    ids = (ids_raw if ids_raw.dtype.kind in "iu"
           else factorize_sorted(ids_raw)[1])
    order = np.lexsort((ids, md5s))
    m = md5s[order]
    first = np.r_[True, m[1:] != m[:-1]] if len(m) else np.array([], bool)
    b = b.take(pa.array(order[first]))
    tagged = pa.table({
        "doc_id": b["doc_id"],
        "text": b["text"],
        "pred_lang": T.lang_id_batch(b["text"]),
    })
    chunks = chunk_table(
        tagged, chunk_chars=cfg.chunk_chars, overlap=cfg.overlap,
        carry_cols=("pred_lang",),
    )
    with lineage.atomic_write(out) as tmp:
        pq.write_table(
            chunks, os.path.join(tmp, "part-00000.parquet"), **WRITE_ARGS
        )
    manifest.record(
        "chunks", part, rows=chunks.num_rows, docs=b.num_rows,
        wall_s=round(time.time() - t0, 3),
    )


def run_corpus(cfg: CorpusConfig) -> dict:
    """Build (or resume) the corpus; returns per-stage metrics."""
    files = lineage.list_parquet_files(cfg.input_path)
    fp = lineage.fingerprint_paths(files, extra=cfg.fingerprint_extra())
    manifest = lineage.Manifest.open(cfg.out_root, fp)
    if manifest.was_stale:
        # a config change (e.g. fewer num_parts) leaves part=K dirs the
        # new run never rewrites — read_chunks would silently mix stale
        # chunks into the corpus; clear the config-shaped layouts
        import shutil

        for sub in ("route", "chunks"):
            shutil.rmtree(os.path.join(cfg.out_root, sub),
                          ignore_errors=True)
    _route(cfg, manifest, files)
    todo = [p for p in range(cfg.num_parts)
            if not manifest.done("chunks", p)]
    if todo:
        with ThreadPoolExecutor(max_workers=cfg.max_concurrent_parts) as ex:
            list(ex.map(lambda p: _run_part(cfg, manifest, p), todo))
    done = manifest.completed("chunks")
    return {
        "parts": len(done),
        "rows": sum(int(r.get("rows", 0)) for r in done),
        "resumed_parts": cfg.num_parts - len(todo),
    }


def read_chunks(cfg: CorpusConfig):
    """The built corpus as a Dataset (all partitions)."""
    import ray.data as rd

    files = lineage.list_parquet_files(os.path.join(cfg.out_root, "chunks"))
    if not files:
        # the quality gate can legitimately drop EVERY document (strict
        # quality_min / min_words); read_parquet errors on an empty path
        # list, so synthesize an empty dataset with the chunk schema
        # (doc_id dtype follows the input so unions stay schema-stable)
        inp = lineage.list_parquet_files(cfg.input_path)
        id_t = (pq.read_schema(inp[0]).field("doc_id").type
                if inp else pa.string())
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], id_t),
            "chunk_idx": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
            "chunk_chars_n": pa.array([], pa.int64()),
            "pred_lang": pa.array([], pa.string()),
        }))
    return rd.read_parquet(files)
