"""Per-partition lineage records + atomic partition writes (resume support).

The reference resumes ingestion at file granularity via a checksum ledger —
already-seen files are skipped (/root/reference/aisdb/database/decoder.py:21-116,
207-231) — and its PK dedup makes re-runs idempotent.  The engine's analog:

- every (stage, partition) output is written to a temp dir and atomically
  renamed into place (``part=K`` directories of parquet files);
- a JSONL manifest appends one record per completed work unit with an input
  fingerprint and per-stage metrics (rows, tokens, wall seconds) — the
  decoder-style instrumentation (decode.rs:228-257) made durable;
- resume = anti-join of pending work units against the manifest (J5/O8 in
  SURVEY.md §2.4/§2.6); a changed input fingerprint invalidates the whole
  manifest (the run restarts rather than mixing inputs);
- the per-stage *watermark* is the count + max id of contiguous completed
  partitions — a killed ``ray job submit`` run restarts and recomputes only
  the missing partitions.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Iterable


def fingerprint_paths(paths: Iterable[str], extra: dict | None = None) -> str:
    """Stable fingerprint of input files (path + size + mtime) and config."""
    h = hashlib.md5()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}:{int(st.st_mtime)}".encode())
    if extra:
        h.update(json.dumps(extra, sort_keys=True).encode())
    return h.hexdigest()


def list_parquet_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(os.path.join(root, f) for f in files if f.endswith(".parquet"))
    return sorted(out)


@dataclass
class Manifest:
    """Append-only JSONL ledger of completed (stage, partition) units."""

    path: str
    fingerprint: str = ""
    # True when open() found a manifest from a DIFFERENT input/config and
    # discarded it — callers must also clear config-shaped output layouts
    # (e.g. part=K dirs beyond a smaller new num_parts) or stale dirs mix
    # into reads
    was_stale: bool = False
    _records: dict[tuple[str, str], dict] = field(default_factory=dict)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    @classmethod
    def open(cls, run_dir: str, fingerprint: str) -> "Manifest":
        os.makedirs(run_dir, exist_ok=True)
        mpath = os.path.join(run_dir, "manifest.jsonl")
        m = cls(path=mpath, fingerprint=fingerprint)
        if os.path.exists(mpath):
            stale = False
            # Parse tracking the byte offset of the last fully-committed
            # (newline-terminated, JSON-parseable) record.  A torn trailing
            # append (killed mid-record) must be TRUNCATED away, not just
            # skipped: the partial line has no newline, so a later append
            # would concatenate onto it and form another unparseable line —
            # every record written after the torn point would then be
            # invisible to every future open() and that work would re-run
            # forever.
            good_offset = 0
            with open(mpath, "rb") as f:
                for raw in f:
                    if not raw.endswith(b"\n"):
                        break  # torn tail: record never fully committed
                    line = raw.strip()
                    if not line:
                        good_offset += len(raw)
                        continue
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        break  # torn append that happens to contain b"\n"
                    good_offset += len(raw)
                    if rec.get("kind") == "header":
                        if rec.get("fingerprint") != fingerprint:
                            stale = True
                            break
                        continue
                    key = (rec["stage"], str(rec["partition"]))
                    if rec.get("kind") == "tombstone":
                        m._records.pop(key, None)
                    else:
                        m._records[key] = rec
            if not stale and good_offset < os.path.getsize(mpath):
                # Repair: drop the torn suffix so subsequent appends land
                # on a clean, durable, newline-terminated prefix.
                with open(mpath, "r+b") as f:
                    f.truncate(good_offset)
                    f.flush()
                    os.fsync(f.fileno())
            if stale:
                # input or config changed: restart clean rather than mixing runs
                os.remove(mpath)
                m._records.clear()
            m.was_stale = stale
        if not os.path.exists(mpath) or os.path.getsize(mpath) == 0:
            with open(mpath, "w") as f:
                f.write(
                    json.dumps(
                        {"kind": "header", "fingerprint": fingerprint, "ts": time.time()}
                    )
                    + "\n"
                )
        return m

    def done(self, stage: str, partition: Any) -> bool:
        return (stage, str(partition)) in self._records

    def completed(self, stage: str) -> list[dict]:
        return [r for (s, _), r in self._records.items() if s == stage]

    def record(self, stage: str, partition: Any, **metrics) -> dict:
        rec = {
            "kind": "unit",
            "stage": stage,
            "partition": str(partition),
            "ts": time.time(),
            **metrics,
        }
        with self._lock:  # partition jobs run on a thread pool
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
                f.flush()
                os.fsync(f.fileno())
            self._records[(stage, str(partition))] = rec
        return rec

    def invalidate(self, stage: str, partition: Any) -> None:
        """Mark a completed unit stale (durable tombstone): the incremental
        refresh path retracts a (stage, partition) before recomputing it, so
        a kill mid-refresh resumes the recompute rather than trusting the
        superseded output's record."""
        key = (stage, str(partition))
        with self._lock:
            if key not in self._records:
                return
            rec = {
                "kind": "tombstone",
                "stage": stage,
                "partition": str(partition),
                "ts": time.time(),
            }
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
                f.flush()
                os.fsync(f.fileno())
            self._records.pop(key, None)

    def get(self, stage: str, partition: Any) -> dict | None:
        return self._records.get((stage, str(partition)))

    def watermark(self, stage: str, partitions: list[Any]) -> dict:
        """Contiguous-completion watermark over an ordered partition list."""
        done = {str(p) for p in partitions if self.done(stage, p)}
        contiguous = 0
        for p in partitions:
            if str(p) in done:
                contiguous += 1
            else:
                break
        return {
            "stage": stage,
            "completed": len(done),
            "total": len(partitions),
            "contiguous_watermark": contiguous,
        }


def atomic_write(out_dir: str):
    """Context manager: yields a temp dir; renames it to ``out_dir`` on success.

    The rename is the commit point — a killed run leaves only ``.tmp`` debris
    that the next run clears, never a half-written partition.
    """

    class _Ctx:
        def __enter__(self):
            self.tmp = out_dir + ".tmp"
            if os.path.exists(self.tmp):
                shutil.rmtree(self.tmp)
            os.makedirs(self.tmp, exist_ok=True)
            return self.tmp

        def __exit__(self, exc_type, exc, tb):
            if exc_type is None:
                if os.path.exists(out_dir):
                    shutil.rmtree(out_dir)
                os.replace(self.tmp, out_dir)
            else:
                shutil.rmtree(self.tmp, ignore_errors=True)
            return False

    return _Ctx()
