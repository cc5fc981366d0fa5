"""Text analysis + dedup family over the driver documents table."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from aisdb_ray.functions import text as T
from aisdb_ray.stages import dedup_text, textstats

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs_pdf():
    return pq.read_table(DOCS).to_pandas()


def test_token_count_matches_python(docs_pdf):
    got = (
        rd.read_parquet(DOCS)
        .map_batches(textstats.token_count_batch, batch_format="pyarrow")
        .to_pandas()
        .set_index("doc_id")["n_tokens"]
    )
    for _, row in docs_pdf.head(50).iterrows():
        assert got[row["doc_id"]] == len(row["text"].split())


def test_quality_score_exact(docs_pdf):
    got = (
        rd.read_parquet(DOCS)
        .map_batches(textstats.quality_batch, batch_format="pyarrow")
        .to_pandas()
    )
    r = got.iloc[0]
    assert r["n_chars"] > 0
    expect = (r["n_alpha"] / r["n_chars"]) * (1 - r["n_punct"] / r["n_chars"])
    assert r["quality_score"] == expect


def test_lang_id_on_known_samples():
    """The driver's synthetic docs carry a lang LABEL but English-ish word-
    salad content, so content-based ID is checked on real snippets."""
    samples = {
        "en": "the cat sat on the mat and it was happy for a while",
        "de": "der Hund und die Katze sind mit einem Ball zu Hause",
        "fr": "le chat est dans la maison et les oiseaux sont dans le jardin",
        "es": "el perro y la casa son de los vecinos en una calle",
        "zh": "今天天气很好我们一起去公园散步吧",
    }
    for lang, s in samples.items():
        assert T.lang_id(s) == lang, (lang, T.lang_id(s))


def test_lang_id_batch_matches_per_row(docs_pdf):
    """The vectorized Arrow path (lang_id_batch, used by the stages) must be
    row-for-row identical to the per-row reference on the whole corpus plus
    crafted edge rows (edge punctuation, adjacent stopwords, empties)."""
    import pyarrow as pa

    texts = list(docs_pdf["text"]) + [
        "",
        "   ",
        "the,the;the the!",          # punct-trimmed adjacent stopwords
        "of the and to in is it",    # every word a stopword
        "und la 今天 the",            # CJK wins over any counts
        "xyzzy qwerty plugh",        # no stopwords -> unknown
        "de la le el",               # cross-language tie -> inventory order
        "DER Hund UND die KATZE ist zu",
    ]
    got = T.lang_id_batch(pa.array(texts, pa.string())).to_pylist()
    want = [T.lang_id(t) for t in texts]
    assert got == want


def test_text_stats_stage_runs(docs_pdf):
    stats = textstats.text_stats(rd.read_parquet(DOCS)).to_pandas()
    assert len(stats) == len(docs_pdf)
    assert set(stats["pred_lang"]) <= {"en", "de", "fr", "es", "zh", "unknown"}
    assert (stats["n_words"] > 0).all()


def test_doc_freq_topk_handcrafted():
    import pandas as pd

    docs = pd.DataFrame(
        {
            "text": [
                "a b a",          # 'a' twice in one doc counts ONCE
                "  b  c ",        # leading/trailing whitespace
                "c",
                "",               # empty doc contributes nothing
            ]
        }
    )
    out = textstats.doc_freq_topk(rd.from_pandas(docs), k=2).to_pandas()
    # df: b=2, c=2, a=1 -> top-2 by (df desc, token asc) = b then c
    assert out["token"].tolist() == ["b", "c"]
    assert out["df"].tolist() == [2, 2]


def test_term_freq_batch_handcrafted():
    import pandas as pd
    import pyarrow as pa

    b = pa.table({"doc_id": ["d1", "d2"], "text": ["a b a", " c  c c "]})
    out = textstats.term_freq_batch(b).to_pandas()
    out = out.sort_values(["doc_id", "token"]).reset_index(drop=True)
    assert list(map(tuple, out.itertuples(index=False))) == [
        ("d1", "a", 2), ("d1", "b", 1), ("d2", "c", 3),
    ]


def test_exact_dedup_keep_first(docs_pdf):
    hashed = rd.read_parquet(DOCS).map_batches(
        lambda b: textstats.md5_batch(b), batch_format="pyarrow"
    )
    kept = dedup_text.keep_first(hashed, "text_md5", "doc_id").to_pandas()
    import hashlib

    want = (
        docs_pdf.assign(
            text_md5=docs_pdf["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
        )
        .groupby("text_md5")["doc_id"]
        .min()
    )
    got = kept.set_index("text_md5")["doc_id"].sort_index()
    assert (got == want.sort_index()).all()
    assert len(got) == docs_pdf["text"].nunique()


def test_minhash_approximates_jaccard():
    mh = T.MinHasher(128)
    a = T.shingle_hashes("the quick brown fox jumps over the lazy dog extra pad".split())
    b = T.shingle_hashes("the quick brown fox jumps over the lazy cat extra pad".split())
    est = (mh.signature(a) == mh.signature(b)).mean()
    true = T.jaccard(a, b)
    assert abs(est - true) < 0.2


def test_minhash_dedup_finds_planted_neardups(tmp_path):
    import pandas as pd

    base = pq.read_table(DOCS).to_pandas().head(40)
    txt = base.iloc[0]["text"]
    near = txt.rsplit(" ", 2)[0] + " zz yy"  # ~identical shingle set
    df = pd.concat(
        [base, pd.DataFrame({"doc_id": [9001], "text": [near], "lang": ["en"],
                             "source": ["x"], "n_chars": [len(near)]})],
        ignore_index=True,
    )
    p = str(tmp_path / "docs.parquet")
    df.to_parquet(p)
    pairs = dedup_text.minhash_dedup_pairs(p, jaccard_threshold=0.5).to_pandas()
    assert ((pairs["a"] == base.iloc[0]["doc_id"]) & (pairs["b"] == 9001)).any()


def test_simhash_pairs_planted(tmp_path):
    import pandas as pd

    base = pq.read_table(DOCS).to_pandas().head(40)
    txt = base.iloc[0]["text"]
    near = txt + " zz"
    df = pd.concat(
        [base, pd.DataFrame({"doc_id": [9002], "text": [near], "lang": ["en"],
                             "source": ["x"], "n_chars": [len(near)]})],
        ignore_index=True,
    )
    p = str(tmp_path / "docs.parquet")
    df.to_parquet(p)
    pairs = dedup_text.simhash_pairs(p, max_hamming=8).to_pandas()
    assert ((pairs["a"] == base.iloc[0]["doc_id"]) & (pairs["b"] == 9002)).any()


def test_fingerprint_deterministic_and_order_sensitive():
    a = T.fingerprint64("one two three".split())
    b = T.fingerprint64("one two three".split())
    c = T.fingerprint64("three two one".split())
    assert a == b and a != c


def test_embedding_neardup_lsh_recall_and_precision(tmp_path):
    """LSH-bucketed pairs: precision 1 (exact verify), high recall on true
    near-dups (cos >= 0.95), deterministic under fixed seeds."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from aisdb_ray.stages import dedup_text

    rng = np.random.default_rng(17)
    base = rng.normal(size=(40, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # rows 0..39 distinct; rows 40..59 are near-copies of rows 0..19
    near = base[:20] + rng.normal(scale=0.01, size=(20, 32))
    m = np.vstack([base, near])
    ids = np.arange(len(m), dtype=np.int64)
    p = str(tmp_path / "emb.parquet")
    pq.write_table(
        pa.table({
            "vec_id": pa.array(ids),
            "embedding": pa.array([row.astype(np.float32) for row in m],
                                  pa.list_(pa.float32())),
        }),
        p,
    )
    got = dedup_text.embedding_neardup_lsh_pairs(p, threshold=0.95).to_pandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got["a"], got["b"])}

    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    want = {(i, j) for i, j in zip(*np.nonzero(np.triu(sims >= 0.95, 1)))}
    assert got_pairs <= want                      # precision 1.0
    assert len(got_pairs) >= 0.8 * len(want)      # LSH recall on near-dups
    assert (0, 40) in got_pairs                   # a known near-copy found


def test_text_stats_vectorized_matches_per_row_oracle():
    """The vectorized TextStats batch (Arrow regex kernels + segmented
    reduceat + unique-word md5 fingerprint) must equal the per-row
    reference functions on every column.  ASCII whitespace only: the
    batch path is RE2 (like the SQL oracle), the per-row path is
    Python re."""
    import pyarrow as pa

    texts = [
        "the quick brown fox",
        "  edge  whitespace  both ends  ",
        "",
        "punct! heavy, text; with: marks? everywhere.",
        "unicode wörds ünd ßtrings 日本語もある",
        "a",
        "repeat repeat repeat repeat",
        "\tmixed\nwhitespace\tforms\n",
    ]
    b = pa.table({"doc_id": [f"d{i}" for i in range(len(texts))],
                  "text": texts})
    got = textstats.TextStats()(b).to_pandas().set_index("doc_id")
    import re
    word_re = re.compile(r"\S+")
    for i, t in enumerate(texts):
        ws = word_re.findall(t)
        q = T.quality_counts(t, ws)
        row = got.loc[f"d{i}"]
        for k, v in q.items():
            assert row[k] == v, (k, t, row[k], v)
        assert np.uint64(row["fingerprint"]) == T.fingerprint64(ws), t
        assert row["pred_lang"] == T.lang_id(t)


def test_repetition_batch_matches_brute_force():
    """Gopher repetition signals: the vectorized kernel equals a per-doc
    Counter reference on crafted inputs (dup lines, repeated grams, empty
    and single-word docs)."""
    import re
    from collections import Counter

    import pyarrow as pa

    texts = [
        "line a\nline b\nline a\nline c",
        "x\nx\nx",
        "",
        "one two one two one",
        "solo",
        "a b\na b\nc d e c d e c d",
        "  spaced   words  \nagain spaced words",
    ]
    b = pa.table({"doc_id": [f"d{i}" for i in range(len(texts))],
                  "text": texts})
    got = textstats.repetition_batch(b).to_pandas()
    wr = re.compile(r"\S+")
    for i, t in enumerate(texts):
        lines = t.split("\n")
        lc = Counter(lines)
        ws = wr.findall(t)
        g2 = [" ".join(ws[j:j + 2]) for j in range(len(ws) - 1)]
        g3 = [" ".join(ws[j:j + 3]) for j in range(len(ws) - 2)]
        exp = dict(
            n_lines=len(lines),
            n_distinct_lines=len(lc),
            dup_line_chars=sum(len(ln) for ln in lines if lc[ln] >= 2),
            n_2grams=len(g2),
            top_2gram_count=max(Counter(g2).values()) if g2 else 0,
            n_3grams=len(g3),
            top_3gram_count=max(Counter(g3).values()) if g3 else 0,
        )
        row = got.iloc[i]
        for k, v in exp.items():
            assert row[k] == v, (t, k, row[k], v)


def test_semdedup_matches_bruteforce(tmp_path):
    """semdedup survivors == numpy replica of assign + cluster-local
    keep-lowest-id pruning, and chunking is invariant."""
    import pyarrow as pa

    rng = np.random.default_rng(31)
    n, dim = 300, 8
    base = rng.normal(size=(40, dim))
    m = base[rng.integers(0, 40, n)] + rng.normal(scale=0.05, size=(n, dim))
    path = str(tmp_path / "emb.parquet")
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(m.astype(np.float32))),
        }),
        path,
    )
    from aisdb_ray.stages.ann import kmeans_fit

    cent = kmeans_fit(m.astype(np.float64), 6, seed=5)
    got = (
        dedup_text.semdedup_survivors(path, cent, threshold=0.9)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )

    mf = m.astype(np.float32).astype(np.float64)
    nrm = np.linalg.norm(mf, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    mn = mf / nrm
    cl = np.argmax(mn @ cent.T, axis=1)
    keep = []
    for c in np.unique(cl):
        idx = np.flatnonzero(cl == c)          # vec_ids ascending
        sub = mn[idx]
        sims = sub @ sub.T
        dup = (np.tril(sims >= 0.9, k=-1)).any(axis=1)
        keep.extend(idx[~dup].tolist())
    want = sorted(keep)
    assert got["vec_id"].tolist() == want
    assert (got["cluster"].to_numpy() == cl[np.array(want)]).all()
    assert 0 < len(got) < n  # some dupes actually dropped


def test_semdedup_all_identical_keeps_one(tmp_path):
    import pyarrow as pa

    v = np.ones((5, 4), np.float32)
    path = str(tmp_path / "same.parquet")
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(5, dtype=np.int64)),
            "embedding": pa.array(list(v)),
        }),
        path,
    )
    cent = np.eye(4, dtype=np.float64)[:2]
    got = dedup_text.semdedup_survivors(path, cent, threshold=0.99).to_pandas()
    assert got["vec_id"].tolist() == [0]


def test_embedding_neardup_cross_block_unordered_ids(tmp_path):
    """A duplicate pair whose SMALLER id lives in a later block must still
    be found (the a<b mask on off-diagonal tiles silently dropped it)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aisdb_ray.stages import dedup_text

    rng = np.random.default_rng(3)
    vecs = rng.normal(0, 1, (6, 8))
    vecs[5] = vecs[0]  # identical pair
    ids = np.array([10, 11, 12, 13, 14, 1], np.int64)  # small id LAST
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array([list(map(float, v)) for v in vecs])})
    p = str(tmp_path / "emb.parquet")
    pq.write_table(t, p)
    got = dedup_text.embedding_neardup_pairs(
        p, threshold=0.999, target_block_rows=2
    ).to_pandas()
    pairs = set(zip(got["a"], got["b"]))
    assert (1, 10) in pairs


def test_distinct_pairs_no_collision_on_wide_ids():
    """Pair dedup must key on the (a, b) composite: the old a*2^31+b fuse
    collided for b >= 2^31 and FABRICATED a pair that never existed."""
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages.dedup_text import _distinct_pairs

    from aisdb_ray.stages.dedup_text import _hash_ctx

    big = (1 << 31) + 5
    with _hash_ctx():  # keyed repartition needs the hash-shuffle backend,
        # and datasets snapshot the context at CREATION time
        pairs = rd.from_arrow(pa.table({
            "a": pa.array([1, 2, 1], pa.int64()),
            "b": pa.array([big, 5, big], pa.int64()),  # (1,big) x2 + (2,5)
        }))
        got = _distinct_pairs(pairs).to_pandas().sort_values(["a", "b"])
    assert set(zip(got["a"], got["b"])) == {(1, big), (2, 5)}


def test_minhash_band_explode_tolerates_empty_blocks():
    import pyarrow as pa

    from aisdb_ray.stages import dedup_text as dt

    empty = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "sig": pa.ListArray.from_arrays(
            pa.array([0], pa.int32()), pa.array([], pa.int64())),
    })
    out = dt._explode_bands(empty, 4, 2)
    assert out.num_rows == 0
    assert out["band"].type == pa.int32()
    assert out["bucket"].type == pa.int64()
