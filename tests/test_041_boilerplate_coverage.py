"""strip_boilerplate segment rules and vocab_coverage rank rule."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages.dedup_text import _doc_segments, strip_boilerplate
from aisdb_ray.stages.tokstats import vocab_coverage


def test_doc_segments_alignment_and_short_tail():
    texts = pa.array(["a b c d e", "x y", ""])
    doc_idx, pos, segs = _doc_segments(texts, seg_words=2)
    assert doc_idx.tolist() == [0, 0, 0, 1]
    assert pos.tolist() == [1, 3, 5, 1]          # 1-based first-word index
    assert segs.to_pylist() == ["a b", "c d", "e", "x y"]


def test_strip_boilerplate_removal_and_reassembly():
    # "hot rod" appears in 3 docs -> boilerplate at min_df=3; "xx yy" in 2
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "hot rod alpha beta",
            "hot rod xx yy",
            "gamma delta hot rod",   # unaligned "hot rod" (pos 3) IS a segment
            "xx yy solo",
        ]),
    })
    got = (
        strip_boilerplate(rd.from_arrow(docs), seg_words=2, min_df=3, min_len=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["n_segs"].tolist() == [2, 2, 2, 2]
    assert got["n_kept"].tolist() == [1, 1, 1, 2]
    assert got["text_clean"].tolist() == [
        "alpha beta", "xx yy", "gamma delta", "xx yy solo",
    ]


def test_strip_boilerplate_min_len_protects_short_segments():
    # "a b" (3 chars) is in every doc but under min_len=4 -> never removed
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b one two", "a b three four", "a b five six"]),
    })
    got = (
        strip_boilerplate(rd.from_arrow(docs), seg_words=2, min_df=2, min_len=4)
        .to_pandas().sort_values("doc_id")
    )
    assert got["n_kept"].tolist() == [2, 2, 2]


def _tok_tbl(rows):
    return pa.table({
        "doc_id": pa.array([f"s:{i:010d}:{i:04d}" for i in range(len(rows))]),
        "source": pa.array(["s"] * len(rows)),
        "n_tok": pa.array([len(r) for r in rows], pa.int32()),
        "tokens": pa.array(rows, pa.list_(pa.int32())),
    })


def test_vocab_coverage_rank_rule_and_ties():
    # counts: id0 x4, id1 x4, id2 x2 -> total 10
    # need90 = (90*10+99)//100 = 9 -> cum [4,8,10] -> k90 = 3
    # need99 = (99*10+99)//100 = 10 -> k99 = 3
    ds = rd.from_arrow(_tok_tbl([[0, 0, 1, 1, 2], [1, 1, 0, 0, 2]]))
    got = vocab_coverage(ds, ps=(50, 90, 99)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["total_tokens"], r["n_distinct"]) == (10, 3)
    # need50 = (500+99)//100 = 5 -> cum[0]=4 < 5 -> k50 = 2 (tie 4,4 ->
    # smaller id first; rank rule counts ids, not values)
    assert (r["k50"], r["k90"], r["k99"]) == (2, 3, 3)
