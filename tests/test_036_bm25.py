"""BM25 retrieval: scoring, exclusion, determinism."""

from __future__ import annotations

import math

import pandas as pd
import ray.data as rd

from aisdb_ray.stages import bm25


def _corpus():
    return pd.DataFrame(
        {
            "doc_id": ["d0", "d1", "d2", "d3"],
            "text": [
                "hash hash hash join",        # heavy on both terms
                "hash tiny",                  # one hit, short doc
                "nothing relevant here at all okay",  # no hits
                "join join padding words here to make this one long",
            ],
        }
    )


def test_bm25_excludes_nonmatching_and_ranks():
    got = bm25.bm25_topk(rd.from_pandas(_corpus()), ["hash", "join"], k=10).to_pandas()
    assert "d2" not in set(got.doc_id)
    assert len(got) == 3
    # scores strictly ordered, d0 (both terms, high tf) first
    assert got.iloc[0].doc_id == "d0"
    assert list(got.score) == sorted(got.score, reverse=True)


def test_bm25_matches_scalar_formula():
    ds = rd.from_pandas(_corpus())
    got = bm25.bm25_topk(ds, ["hash"], k=10).to_pandas().set_index("doc_id")
    # corpus constants
    n_docs, n_words = 4, 4 + 2 + 6 + 10
    avgdl = float(n_words) / float(n_docs)
    idf = (float(n_docs - 2) + 0.5) / (float(2) + 0.5)

    def score(tf, dl):
        return idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))

    assert got.loc["d0", "score"] == score(3.0, 4.0)
    assert got.loc["d1", "score"] == score(1.0, 2.0)
    assert len(got) == 2


def test_bm25_zero_df_term_harmless():
    got = bm25.bm25_topk(rd.from_pandas(_corpus()), ["zzz_absent"], k=5).to_pandas()
    assert len(got) == 0


def test_bm25_zero_df_term_and_empty_corpus():
    """A query term absent from the corpus contributes idf=(N+0.5)/0.5 —
    and the engine must agree with the SQL oracle's idf expression (the
    old oracle went NULL and returned zero rows).  An empty corpus yields
    zero hits, not ZeroDivisionError."""
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages import bm25

    docs = rd.from_arrow(pa.table({
        "doc_id": ["d1", "d2"],
        "text": ["apple banana", "banana cherry"],
    }))
    out = bm25.bm25_topk(docs, ["banana", "zzz_absent"], k=5).to_pandas()
    assert len(out) == 2 and (out["score"] > 0).all()

    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.string()),
        "text": pa.array([], pa.string()),
    }))
    assert bm25.bm25_topk(empty, ["x"], k=5).count() == 0


def test_bm25_empty_corpus_schema_follows_input_id_dtype():
    """The empty-corpus early return must carry the INPUT's doc_id dtype
    (int64 here), not a hardcoded string column."""
    import pyarrow as pa

    empty = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    })
    out = bm25.bm25_topk(rd.from_arrow(empty), ["alpha"], k=5)
    sch = out.schema()
    types = dict(zip(sch.names, sch.types))
    assert types["doc_id"] == pa.int64()
    assert out.count() == 0
