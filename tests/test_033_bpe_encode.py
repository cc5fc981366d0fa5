"""Trained BPE tokenizer (stages/bpe.py) + model-in-actor embedding encoder
(stages/encode.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from aisdb_ray.stages import bpe, encode

CORPUS = [
    "the banana band banned bananas",
    "a banana a day keeps the banana doctor away",
    "band practice and banana bread for the band",
    "bread and butter, butter and bread",
    "the band played on and on and on",
]


def _docs_ds():
    return rd.from_pandas(
        pd.DataFrame({"doc_id": [f"d{i}" for i in range(len(CORPUS))],
                      "text": CORPUS})
    )


def _py_encode(text: str, merges) -> str:
    S = bpe.SEP
    s = "".join(S + ch + S for ch in text)
    for a, b in merges:
        s = s.replace(S + a + S + S + b + S, S + a + b + S)
    s = s.replace(S + S, S)
    return s.removeprefix(S).removesuffix(S)


def test_symbol_aligned_matching_no_cross_piece_merge():
    """Regression: piece 'ban' followed by piece 'a' must NOT trigger the
    ('an','a') rule mid-symbol — matches are symbol-aligned."""
    merges = [("a", "n"), ("b", "an"), ("an", "a")]
    got = bpe.encode_batch(pa.array(["banana"]), merges).to_pylist()[0]
    # b,a,n,a,n,a -> (an)(an): b,an,an,a -> (b,an): ban,an,a -> (an,a):
    # ban,ana  — NOT b,anana or banan,a
    assert got.split(bpe.SEP) == ["ban", "ana"]
    # left-to-right adjacent merging: aaaa + (a,a) -> (aa)(aa)
    got2 = bpe.encode_batch(pa.array(["aaaa"]), [("a", "a")]).to_pylist()[0]
    assert got2.split(bpe.SEP) == ["aa", "aa"]


def test_fit_is_deterministic_and_merges_common_pairs():
    m1 = bpe.fit_bpe(_docs_ds(), n_merges=20, vocab_words=64)
    m2 = bpe.fit_bpe(_docs_ds(), n_merges=20, vocab_words=64)
    assert m1 == m2 and len(m1) > 0
    pieces = {a + b for a, b in m1}
    assert any("an" in p or "the" in p or "ba" in p for p in pieces)


def test_train_merges_matches_reference_counter():
    """train_merges vs an independent pair-count reference on round 1."""
    wc = [("banana", 5), ("band", 3), ("bread", 2)]
    merges = bpe.train_merges(wc, n_merges=1)
    # by hand: an×2×5=10(an in banana twice), na×2? b-a-n-a-n-a pairs:
    # ba,an,na,an,na -> an:10, na:10, ba:5(+band 3 -> ba:8? band: b-a-n-d ->
    # ba,an,nd): an:10+3=13 na:10 ba:5+3=8 nd:3 br:2 re:2 ea:2 ad:2
    assert merges == [("a", "n")]


def test_encode_batch_matches_per_row_python():
    merges = bpe.fit_bpe(_docs_ds(), n_merges=25, vocab_words=64)
    texts = CORPUS + ["", "x", "unseen wordz!!", "a\nb c"]
    got = bpe.encode_batch(pa.array(texts), merges).to_pylist()
    want = [_py_encode(t, merges) for t in texts]
    assert got == want


def test_encode_never_crosses_whitespace():
    merges = bpe.fit_bpe(_docs_ds(), n_merges=30, vocab_words=64)
    enc = bpe.encode_batch(pa.array(["banana banana"]), merges).to_pylist()[0]
    pieces = enc.split(bpe.SEP)
    for p in pieces:
        # a piece is either pure whitespace or contains none
        assert p.isspace() or (" " not in p and "\n" not in p)


def test_ids_roundtrip_decode():
    merges = bpe.fit_bpe(_docs_ds(), n_merges=25, vocab_words=64)
    base = sorted({ch for t in CORPUS for ch in t})
    vocab = bpe.piece_vocab(merges, base)
    texts = pa.array(CORPUS)
    ids = bpe.encode_ids_batch(texts, merges, vocab)
    for i, t in enumerate(CORPUS):
        got = bpe.decode_ids(ids[i].as_py(), vocab)
        assert got == t


def test_encode_documents_counts():
    merges = bpe.fit_bpe(_docs_ds(), n_merges=25, vocab_words=64)
    out = bpe.encode_documents(_docs_ds(), merges).to_pandas()
    assert len(out) == len(CORPUS)
    for _, r in out.iterrows():
        n = r["enc"].count(bpe.SEP) + (1 if r["enc"] else 0)
        assert r["n_pieces"] == n
        # merges compress: never more pieces than characters
        orig = CORPUS[int(r["doc_id"][1:])]
        assert r["n_pieces"] <= len(orig)
        assert r["enc"].replace(bpe.SEP, "") == orig


def test_encode_token_ids_exploded_matches_ids():
    """The (doc_id, pos, token_id) long form re-assembles into exactly the
    per-doc id lists (and decodes back to the original text); empty docs
    emit zero rows."""
    merges = bpe.fit_bpe(_docs_ds(), n_merges=25, vocab_words=64)
    base = sorted({ch for t in CORPUS for ch in t})
    vocab = bpe.piece_vocab(merges, base)
    texts = CORPUS + [""]
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": [f"d{i}" for i in range(len(texts))],
                      "text": texts})
    )
    out = bpe.encode_token_ids(docs, merges, vocab).to_pandas()
    assert (out["token_id"] >= 0).all()  # full vocab coverage
    assert f"d{len(CORPUS)}" not in set(out["doc_id"])  # empty doc -> 0 rows
    for i, t in enumerate(CORPUS):
        g = out[out["doc_id"] == f"d{i}"].sort_values("pos")
        assert list(g["pos"]) == list(range(1, len(g) + 1))
        assert bpe.decode_ids(g["token_id"].tolist(), vocab) == t


def test_corpus_alphabet_distributed():
    base = bpe.corpus_alphabet(_docs_ds())
    assert base == sorted({ch for t in CORPUS for ch in t})


def test_embedding_encoder_matches_numpy_reference():
    """Actor-pool encoder == per-row numpy reference (hashing trick +
    integer projection), including empty and whitespace-only docs."""
    from aisdb_ray.functions import text as T

    texts = CORPUS + ["", "   ", "zzz unseen"]
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": [f"d{i}" for i in range(len(texts))],
                      "text": texts})
    )
    got = encode.encode_documents(docs).to_pandas().set_index("doc_id")
    w = encode.encode_matrix()
    for i, t in enumerate(texts):
        x = np.zeros(encode.N_FEATURES, dtype=np.int64)
        for word in t.split():
            x[T.md5_64(word) % encode.N_FEATURES] += 1
        want = x @ w
        row = got.loc[f"d{i}"]
        for d in range(encode.N_DIMS):
            assert row[f"e{d:02d}"] == want[d], (i, d)


def test_mips_topk_matches_brute_force():
    """encode → MIPS top-k equals the numpy brute force with the same
    (score desc, doc_id asc) tie rule."""
    from aisdb_ray.functions import text as T

    texts = CORPUS * 3  # duplicated docs force score ties across doc_ids
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": [f"d{i:02d}" for i in range(len(texts))],
                      "text": texts})
    )
    q = encode.mips_queries(n_queries=3)
    got = (
        encode.mips_topk(encode.encode_documents(docs), q, k=4)
        .to_pandas()
        .sort_values(["qid", "score", "doc_id"],
                     ascending=[True, False, True])
        .reset_index(drop=True)
    )
    w = encode.encode_matrix()
    y = np.zeros((len(texts), encode.N_DIMS), dtype=np.int64)
    for i, t in enumerate(texts):
        x = np.zeros(encode.N_FEATURES, dtype=np.int64)
        for word in t.split():
            x[T.md5_64(word) % encode.N_FEATURES] += 1
        y[i] = x @ w
    for qi in range(3):
        s = y @ q[qi]
        ids = np.array([f"d{i:02d}" for i in range(len(texts))], dtype=object)
        order = np.lexsort((ids, -s))[:4]
        g = got[got["qid"] == qi]
        assert list(g["doc_id"]) == list(ids[order])
        np.testing.assert_array_equal(g["score"].to_numpy(), s[order])


def test_encode_sql_artifacts_embed():
    """The SQL restatements embed the learned/seeded artifacts verbatim."""
    merges = [("a", "n"), ("an", "a")]
    s = bpe.encode_sql(merges)
    assert "replace(" in s and "chr(31)" in s
    s2 = encode.encode_sql()
    w = encode.encode_matrix()
    assert f"(0, 0, {int(w[0, 0])})" in s2


def test_encode_ids_empty_doc_and_oov_and_delimiter():
    """Empty docs yield EMPTY token lists (not [-1]); out-of-vocab pieces
    drop; a raw U+001F in the text is stripped, never misparsed."""
    import pyarrow as pa

    from aisdb_ray.stages import bpe

    merges = [("a", "b")]
    vocab = bpe.piece_vocab(merges, ["a", "b", "c"])
    texts = pa.array(["", "abc", "aqb", "a\x1fb"], pa.string())
    out = bpe.encode_ids_batch(texts, merges, vocab)
    lists = out.to_pylist()
    assert lists[0] == []                         # empty doc
    assert lists[1] == [vocab["ab"], vocab["c"]]  # normal path
    assert lists[2] == [vocab["a"], vocab["b"]]   # 'q' OOV: dropped
    assert lists[3] == [vocab["ab"]]              # delimiter stripped


def test_corpus_alphabet_tolerates_null_text():
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages import bpe

    ds = rd.from_arrow(pa.table({
        "text": pa.array(["ab", None, "bc"], pa.string()),
    }))
    assert bpe.corpus_alphabet(ds) == ["a", "b", "c"]


def test_vocab_lookup_cache_is_single_slot():
    """ADVICE r4: the per-worker piece->id lookup cache must not grow
    without bound across distinct vocabs — one slot, latest vocab wins,
    and eviction never changes results."""
    merges = [("a", "b")]
    v1 = bpe.piece_vocab(merges, ["a", "b"])
    v2 = bpe.piece_vocab(merges, ["a", "b", "c"])
    texts = pa.array(["ab", "abc"], pa.string())
    first = bpe.encode_ids_batch(texts, merges, v1).to_pylist()
    for v in (v2, v1, v2, v1):  # alternate vocabs to churn the cache
        bpe.encode_ids_batch(texts, merges, v)
    assert len(bpe._LOOKUP_CACHE) == 1
    assert bpe.encode_ids_batch(texts, merges, v1).to_pylist() == first


def test_encode_sql_per_row_with_duplicate_doc_ids(tmp_path):
    """The engine encodes every input ROW; the SQL oracle must do the
    same — grouping by doc_id would merge duplicate-id rows' word counts
    into one wrong embedding."""
    import duckdb
    import pyarrow.parquet as pq

    t = pa.table({
        "doc_id": pa.array([1, 1, 2], pa.int64()),
        "text": pa.array(["alpha beta", "gamma delta epsilon", "alpha"]),
    })
    p = tmp_path / "documents.parquet"
    pq.write_table(t, str(p))

    eng = encode.encode_documents(rd.from_arrow(t), concurrency=1).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    sql = con.execute(encode.encode_sql()).fetch_df()
    cols = sorted(eng.columns)
    left = eng[cols].sort_values(cols).reset_index(drop=True)
    right = sql[cols].sort_values(cols).reset_index(drop=True)
    assert len(left) == 3  # one row per INPUT row, not per doc_id
    pd.testing.assert_frame_equal(left, right, check_dtype=False)


def test_empty_vocab_all_oov_not_crash():
    """Artifacts trained on an empty corpus (merges=[], vocab={}) must
    encode any text to empty token lists — OOV drop, not IndexError."""
    texts = pa.array(["hello", ""], pa.string())
    out = bpe.encode_ids_batch(texts, [], {})
    assert out.to_pylist() == [[], []]


def test_fit_strips_structural_sep():
    """Training must mirror encode_batch's SEP strip: a corpus document
    containing U+001F must not plant the delimiter into learned merges or
    the alphabet (the encoder can never produce such pieces)."""
    t = pa.table({"text": pa.array(["ab ab a\x1fb ab", "\x1f\x1f"])})
    ds = rd.from_arrow(t)
    assert "\x1f" not in bpe.corpus_alphabet(ds)
    wc = bpe.corpus_word_counts(ds).to_pandas()
    assert not wc.word.str.contains("\x1f").any()
    # the SEP-stripped 'a\x1fb' counts as a 4th 'ab' occurrence
    assert int(wc.set_index("word").loc["ab", "c"]) == 4
