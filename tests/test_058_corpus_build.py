"""Resumable corpus build (pipelines/corpus.py): materialized == live
composition, kill-and-resume equality, and completed-partition skip."""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BUILD_SCRIPT = """
import os, sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
ctx = DataContext.get_current()
ctx.enable_progress_bars = False
ctx.enable_tensor_extension_casting = False
from aisdb_ray.pipelines import corpus
cfg = corpus.CorpusConfig(input_path={inp!r}, out_root={out!r}, num_parts=6,
                          max_concurrent_parts=1)
print("START", flush=True)
m = corpus.run_corpus(cfg)
print("DONE", m, flush=True)
"""


@pytest.fixture(scope="module")
def docs_path(tmp_path_factory) -> str:
    """A deterministic synthetic document table with planted duplicates,
    junk rows and quality spread."""
    rng = np.random.default_rng(21)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "kappa",
             "lambda", "sigma", "omega"]
    rows = []
    for i in range(400):
        k = rng.integers(5, 60)
        text = " ".join(rng.choice(words, size=k))
        rows.append((i, text))
    # exact duplicates under different ids (keep-first must pick min id)
    for i in range(400, 440):
        rows.append((i, rows[i % 40][1]))
    # junk that the quality gate should drop
    for i in range(440, 460):
        rows.append((i, "x"))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    p = tmp_path_factory.mktemp("docs") / "documents.parquet"
    pq.write_table(tbl, str(p))
    return str(p)


def _read_chunks(out_root):
    import glob

    fs = sorted(glob.glob(os.path.join(out_root, "chunks", "**", "*.parquet"),
                          recursive=True))
    t = pa.concat_tables([pq.read_table(f) for f in fs])
    import pandas as pd

    return (
        t.to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )


def test_materialized_equals_live_composition(docs_path, tmp_path):
    """The corpus build must equal the live 5-stage composition run as
    plain Dataset transforms over the same input."""
    import ray.data as rd

    from aisdb_ray.functions import text as T
    from aisdb_ray.pipelines import corpus
    from aisdb_ray.stages import scrub as scrub_mod
    from aisdb_ray.stages import textstats
    import pyarrow.compute as pc

    out = str(tmp_path / "build")
    cfg = corpus.CorpusConfig(
        input_path=docs_path, out_root=out, num_parts=5
    )
    m = corpus.run_corpus(cfg)
    got = _read_chunks(out)

    ds = rd.read_parquet(docs_path)

    def gate(b):
        q = textstats.quality_batch(b)
        b = textstats.md5_batch(b)
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(q["quality_score"], pa.scalar(0.75)),
                pc.greater_equal(q["n_words"], pa.scalar(20, pa.int64())),
            ),
            pc.greater(q["n_chars"], pa.scalar(0, pa.int64())),
        )
        return b.filter(pc.fill_null(keep, False))

    gated = ds.map_batches(gate, batch_format="pyarrow")

    def keep_first(g):
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        return g.take(pa.array([int(np.argmin(ids))]))

    first = gated.groupby("text_md5").map_groups(
        keep_first, batch_format="pyarrow"
    )
    tagged = first.map_batches(
        lambda b: pa.table({
            "doc_id": b["doc_id"], "text": b["text"],
            "pred_lang": T.lang_id_batch(b["text"]),
        }),
        batch_format="pyarrow",
    )
    want = (
        scrub_mod.chunk_documents(
            tagged, chunk_chars=120, overlap=24, carry_cols=("pred_lang",)
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    assert m["rows"] == len(want) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(got[want.columns], want)
    # planted duplicates collapsed to the min id: no 400+ id whose text
    # duplicates a sub-40 id survives
    assert got[got.doc_id >= 400].empty


def test_second_run_skips_all_partitions(docs_path, tmp_path):
    from aisdb_ray.pipelines import corpus

    out = str(tmp_path / "build2")
    cfg = corpus.CorpusConfig(input_path=docs_path, out_root=out, num_parts=4)
    corpus.run_corpus(cfg)
    m2 = corpus.run_corpus(cfg)
    assert m2["resumed_parts"] == 4  # nothing recomputed


def test_kill_and_resume_equals_clean_run(docs_path, tmp_path):
    out_clean = str(tmp_path / "clean")
    out_killed = str(tmp_path / "killed")
    env = dict(os.environ, PYTHONPATH=REPO)

    subprocess.run(
        [sys.executable, "-c",
         BUILD_SCRIPT.format(repo=REPO, inp=docs_path, out=out_clean)],
        env=env, check=True, capture_output=True, timeout=600,
    )

    proc = subprocess.Popen(
        [sys.executable, "-c",
         BUILD_SCRIPT.format(repo=REPO, inp=docs_path, out=out_killed)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    man = os.path.join(out_killed, "manifest.jsonl")
    deadline = time.time() + 600
    killed_mid_run = False
    while time.time() < deadline:
        if proc.poll() is not None:
            break
        if os.path.exists(man):
            units = [
                json.loads(l) for l in open(man)
                if l.strip() and '"chunks"' in l
            ]
            if len(units) >= 1:
                proc.send_signal(signal.SIGKILL)
                proc.wait()
                killed_mid_run = True
                break
        time.sleep(0.02)
    assert proc.poll() is not None

    subprocess.run(
        [sys.executable, "-c",
         BUILD_SCRIPT.format(repo=REPO, inp=docs_path, out=out_killed)],
        env=env, check=True, capture_output=True, timeout=600,
    )
    import pandas as pd

    a = _read_chunks(out_killed)
    b = _read_chunks(out_clean)
    pd.testing.assert_frame_equal(a, b)
    if not killed_mid_run:
        pytest.skip("run finished before the kill window (timing)")


def test_corpus_config_change_clears_stale_parts(tmp_path, docs_path):
    """Shrinking num_parts must not leave old part=K chunk dirs that
    read_chunks would silently mix into the corpus."""
    import os

    from aisdb_ray.pipelines import corpus

    root = str(tmp_path / "c")
    corpus.run_corpus(corpus.CorpusConfig(
        input_path=docs_path, out_root=root, num_parts=6,
        max_concurrent_parts=2,
    ))
    assert os.path.isdir(os.path.join(root, "chunks", "part=5"))
    corpus.run_corpus(corpus.CorpusConfig(
        input_path=docs_path, out_root=root, num_parts=2,
        max_concurrent_parts=2,
    ))
    parts = sorted(os.listdir(os.path.join(root, "chunks")))
    assert parts == ["part=0", "part=1"]


def test_corpus_null_text_and_string_ids(tmp_path):
    """Null text rows must be gated out (not crash the md5 pass) and
    string doc_ids must dedup fine (the old int64 cast crashed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aisdb_ray.pipelines import corpus

    t = pa.table({
        "doc_id": ["s:001", "s:002", "s:003"],
        "text": pa.array(
            ["a good document with enough words to pass the gate easily "
             "and some more filler words here", None,
             "a good document with enough words to pass the gate easily "
             "and some more filler words here"],
            pa.string()),
    })
    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(t, str(src / "p.parquet"))
    out = corpus.run_corpus(corpus.CorpusConfig(
        input_path=str(src), out_root=str(tmp_path / "o"), num_parts=2,
        max_concurrent_parts=1, min_words=10,
    ))
    assert out["rows"] == 1  # dup text deduped, null text gated, no crash


def test_corpus_all_docs_gated_reads_empty(tmp_path):
    """When the quality gate drops every document, run_corpus succeeds and
    read_chunks must return an EMPTY dataset with the chunk schema (it
    used to raise on the empty file list)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aisdb_ray.pipelines import corpus

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["too short", "also short"]),
    })
    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(t, str(src / "p.parquet"))
    cfg = corpus.CorpusConfig(
        input_path=str(src), out_root=str(tmp_path / "o"), num_parts=2,
        max_concurrent_parts=1,  # default min_words=20 gates everything
    )
    out = corpus.run_corpus(cfg)
    assert out["rows"] == 0
    ds = corpus.read_chunks(cfg)
    assert ds.count() == 0
    names = set(ds.schema().names)
    assert {"doc_id", "chunk_idx", "chunk_text", "pred_lang"} <= names
