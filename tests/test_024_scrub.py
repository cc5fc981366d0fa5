"""Scrub + chunking: stock PII patterns on handcrafted text, chunk-window
edge cases (empty doc, short doc, exact boundary, overlap stitching)."""

from __future__ import annotations

import pyarrow as pa

from aisdb_ray.stages import scrub


def _ds(tbl: pa.Table):
    import ray.data as rd

    return rd.from_arrow(tbl)


def test_pii_patterns_redact():
    texts = [
        "mail me at jane.doe+spam@example.co.uk today",
        "see https://example.com/a?b=1 and http://x.io",
        "server at 192.168.001.1 is down",
        "call +1 (555) 123-4567 now",
        "nothing sensitive here",
    ]
    got = (
        scrub.scrub(_ds(pa.table({"text": texts})), "text")
        .to_pandas()["text"]
        .tolist()
    )
    assert got[0] == "mail me at <EMAIL> today"
    assert got[1] == "see <URL> and <URL>"
    assert got[2] == "server at <IP> is down"
    assert got[3] == "call <PHONE> now"
    assert got[4] == "nothing sensitive here"


def test_scrub_out_col_keeps_original():
    t = pa.table({"doc_id": ["a"], "text": ["x@y.zz"]})
    df = scrub.scrub(_ds(t), "text", out_col="clean").to_pandas()
    assert df["text"][0] == "x@y.zz" and df["clean"][0] == "<EMAIL>"


def test_chunk_windows_and_overlap():
    text = "".join(chr(ord("a") + (i % 26)) for i in range(250))
    t = pa.table({"doc_id": ["d1", "d2", "d3"],
                  "text": [text, "short", ""]})
    df = (
        scrub.chunk_documents(_ds(t), chunk_chars=100, overlap=20)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    d1 = df[df["doc_id"] == "d1"]
    # starts at 0, 80, 160, 240 (all < 250)
    assert d1["chunk_idx"].tolist() == [0, 1, 2, 3]
    assert d1["chunk_chars_n"].tolist() == [100, 100, 90, 10]
    # overlap region of consecutive chunks must agree
    c0, c1 = d1["chunk_text"].iloc[0], d1["chunk_text"].iloc[1]
    assert c0[80:] == c1[:20]
    # stitching non-overlapping parts reconstructs the document
    rebuilt = c0 + "".join(c[20:] for c in d1["chunk_text"].iloc[1:])
    assert rebuilt == text
    # short doc -> one truncated chunk; empty doc -> no chunks
    assert df[df["doc_id"] == "d2"]["chunk_text"].tolist() == ["short"]
    assert len(df[df["doc_id"] == "d3"]) == 0


def test_chunk_exact_boundary():
    # length == chunk_chars: exactly one chunk (next start = stride >= len
    # only when stride >= len; with stride 80 < 100 a second, overlap-only
    # chunk exists — pin the start-< len rule precisely)
    t = pa.table({"doc_id": ["x"], "text": ["a" * 100]})
    df = scrub.chunk_documents(_ds(t), chunk_chars=100, overlap=20).to_pandas()
    assert df["chunk_idx"].tolist() == [0, 1]
    assert df["chunk_chars_n"].tolist() == [100, 20]

    t2 = pa.table({"doc_id": ["y"], "text": ["a" * 80]})
    df2 = scrub.chunk_documents(_ds(t2), chunk_chars=100, overlap=20).to_pandas()
    assert df2["chunk_idx"].tolist() == [0]


# ---------------------------------------------------------------- property

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    text=st.text(min_size=0, max_size=400),
    chunk=st.integers(min_value=2, max_value=120),
    data=st.data(),
)
def test_chunk_stitching_property(text, chunk, data):
    """For ANY text (unicode included) and window geometry: chunk k starts
    at k*stride, covers min(chunk, len-start) codepoints, and stitching
    non-overlap tails reconstructs the document exactly."""
    overlap = data.draw(st.integers(min_value=0, max_value=chunk - 1))
    stride = chunk - overlap
    tbl = pa.table({"doc_id": ["d"], "text": [text]})
    df = scrub.chunk_documents(
        _ds(tbl), chunk_chars=chunk, overlap=overlap
    ).to_pandas()
    if len(df):
        df = df.sort_values("chunk_idx").reset_index(drop=True)
    n = len(text)
    want_chunks = 0 if n == 0 else (n - 1) // stride + 1
    assert len(df) == want_chunks
    for k, row in df.iterrows():
        start = k * stride
        assert row["chunk_text"] == text[start:start + chunk]
        assert row["chunk_chars_n"] == len(text[start:start + chunk])
    if want_chunks:
        rebuilt = df["chunk_text"].iloc[0] + "".join(
            c[overlap:] for c in df["chunk_text"].iloc[1:]
        )
        assert rebuilt == text


def test_token_windows_evidence():
    toks = [list(range(10)), [7], []]
    t = pa.table({
        "doc_id": ["a", "b", "c"],
        "tokens": pa.array(toks, pa.list_(pa.int32())),
    })
    df = (
        scrub.chunk_token_sequences(_ds(t), window=4, overlap=1)
        .to_pandas()
        .sort_values(["doc_id", "win_idx"])
        .reset_index(drop=True)
    )
    # doc a: starts 0,3,6,9 -> windows [0..3],[3..6],[6..9],[9]
    a = df[df["doc_id"] == "a"]
    assert a["win_idx"].tolist() == [0, 1, 2, 3]
    assert a["win_len"].tolist() == [4, 4, 4, 1]
    assert a["tok_sum"].tolist() == [0 + 1 + 2 + 3, 3 + 4 + 5 + 6, 6 + 7 + 8 + 9, 9]
    assert a["tok_first"].tolist() == [0, 3, 6, 9]
    assert a["tok_last"].tolist() == [3, 6, 9, 9]
    # single-token doc -> one window; empty doc -> none
    b = df[df["doc_id"] == "b"]
    assert b["win_len"].tolist() == [1] and b["tok_sum"].tolist() == [7]
    assert len(df[df["doc_id"] == "c"]) == 0


def test_chunk_carry_cols():
    """Per-document columns replicate onto every chunk."""
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages.scrub import chunk_documents

    t = pa.table(
        {
            "doc_id": [1, 2],
            "text": ["abcdefghij", "xy"],
            "lang": ["en", "de"],
        }
    )
    out = (
        chunk_documents(rd.from_arrow(t), chunk_chars=4, overlap=1,
                        carry_cols=("lang",))
        .to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    )
    assert out.loc[out["doc_id"] == 1, "lang"].eq("en").all()
    assert out.loc[out["doc_id"] == 2, "lang"].tolist() == ["de"]
    # stitching unchanged by the carry column
    got = "".join(
        c[: 3] for c in out.loc[out["doc_id"] == 1, "chunk_text"][:-1]
    ) + out.loc[out["doc_id"] == 1, "chunk_text"].iloc[-1]
    assert got == "abcdefghij"


def test_normalize_text():
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages.scrub import normalize_batch, normalize_text

    t = pa.table(
        {"doc_id": [1, 2, 3],
         "text": ["Caf\u00e9  X ", "\u1e9e One\tTwo", " a  b "]}
    )
    out = normalize_batch(t, "text", "norm")["norm"].to_pylist()
    assert out == ["caf\u00e9 x", "\u00df one two", "a b"]
    # NFC must COMPOSE: decomposed e+combining-acute -> precomposed é
    dec = pa.table({"text": ["Cafe\u0301"]})
    assert normalize_batch(dec, "text")["text"].to_pylist() == ["caf\u00e9"]
    ds = normalize_text(rd.from_arrow(t), "text").to_pandas()
    assert ds["text"].tolist() == out


def test_normalize_and_chunk_accept_large_string():
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages import scrub

    t = pa.table({"doc_id": ["a", "b"],
                  "text": pa.array(["Héllo  World", ""], pa.large_string())})
    out = scrub.normalize_text(rd.from_arrow(t), "text").to_pandas()
    assert out["text"].tolist()[0] == "héllo world"
    ch = scrub.chunk_documents(
        rd.from_arrow(t), chunk_chars=5, overlap=1
    ).to_pandas()
    assert len(ch) >= 2  # empty doc yields none, non-empty chunks fine


def test_chunk_token_sequences_drops_null_elements():
    import pyarrow as pa
    import ray.data as rd

    from aisdb_ray.stages import scrub

    t = pa.table({
        "doc_id": ["a", "b"],
        "tokens": pa.array([[1, 2, 3, 4], [5, None, 7, 8]],
                           pa.list_(pa.int32())),
    })
    out = scrub.chunk_token_sequences(
        rd.from_arrow(t), window=2, overlap=0
    ).to_pandas()
    assert set(out["doc_id"]) == {"a"}
    assert (out["tok_sum"] >= 0).all()
