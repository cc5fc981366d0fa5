"""Degenerate-input hardening for the session's new stages: empty tables,
single rows, and all-identical keys must not crash and must return the
shapes their contracts promise."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages import contamination, corr, packing, sketch, twa, window


def _empty_pts():
    return pa.table(
        {
            "source": pa.array([], pa.string()),
            "seg": pa.array([], pa.int64()),
            "time": pa.array([], pa.int64()),
            "seq": pa.array([], pa.int64()),
            "n_tok": pa.array([], pa.int32()),
        }
    )


def test_blocks_accept_empty():
    e = _empty_pts()
    assert len(packing.pack_block(e, cap=100)) == 0
    assert len(twa.twa_block(e, 3600)) == 0
    assert len(window.deltas_block(e, "source", "time", "seq")) == 0
    assert len(window.cusum_block(e, "source", "time", "seq", "n_tok", 10)) == 0
    assert len(corr.gram_block(pa.table(
        {"source": pa.array([], pa.string()),
         "bucket": pa.array([], pa.int64()),
         "sum_n_tok": pa.array([], pa.int64())}
    ))) == 0
    assert len(sketch.hll_partial_batch(pa.table(
        {"event_type": pa.array([], pa.string()),
         "user_id": pa.array([], pa.int64())}
    ), "event_type", "user_id")) == 0
    assert len(sketch.cms_partial_batch(pa.table(
        {"text": pa.array([], pa.string())}
    ))) == 0
    assert len(contamination.word_ngrams_block(pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    ))) == 0


def test_single_row_semantics():
    one = pa.table(
        {
            "source": ["s"], "seg": pa.array([0], pa.int64()),
            "time": pa.array([100], pa.int64()),
            "seq": pa.array([0], pa.int64()),
            "n_tok": pa.array([7], pa.int32()),
        }
    )
    # one doc packs into bin 0; no deltas; no TWA holds; one source -> no pairs
    p = packing.pack_block(one, cap=100)
    assert p["bin"].to_pylist() == [0]
    assert len(window.deltas_block(one, "source", "time", "seq")) == 0
    assert len(twa.twa_block(one, 3600)) == 0
    g = corr.gram_block(pa.table(
        {"source": ["s"], "bucket": pa.array([0], pa.int64()),
         "sum_n_tok": pa.array([5], pa.int64())}
    ))
    assert len(g) == 0


def test_contamination_empty_benchmark():
    """No benchmark rows -> zero contaminated training docs, no crash."""
    docs = pd.DataFrame({"doc_id": [1, 2], "text": ["a b c d e f g h"] * 2})

    def pred(b):
        return pa.array(np.zeros(b.num_rows, bool))

    out = contamination.contamination(rd.from_pandas(docs), pred, n=8).to_pandas()
    assert len(out) == 0
