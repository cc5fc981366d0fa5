"""Exact duplicated-substring spans vs brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages import dupspans


def _brute(texts: dict, L: int):
    from collections import Counter

    grams = Counter()
    for t in texts.values():
        for i in range(len(t) - L + 1):
            grams[t[i:i + L]] += 1
    spans = {}
    for d, t in texts.items():
        # 1-based window starts, exclusive-ish end = start + L (the
        # engine/SQL convention)
        marked = [i + 1 for i in range(len(t) - L + 1)
                  if grams[t[i:i + L]] >= 2]
        out = []
        for p in marked:
            if out and p <= out[-1][1]:
                out[-1] = (out[-1][0], max(out[-1][1], p + L), out[-1][2] + 1)
            else:
                out.append((p, p + L, 1))
        if out:
            spans[d] = out
    return spans


def _run(texts: dict, L: int):
    t = pa.table({"doc_id": list(texts), "text": list(texts.values())})
    got = dupspans.duplicated_spans(
        rd.from_arrow(t).repartition(3), L=L
    ).to_pandas()
    if got.empty:
        return {}
    got = got.sort_values(["doc_id", "w_start"])
    out = {}
    for d, g in got.groupby("doc_id"):
        out[d] = list(zip(g["w_start"].astype(int), g["w_end"].astype(int),
                          g["n_merged"].astype(int)))
    return out


def test_dup_spans_planted():
    boiler = "SUBSCRIBE TO OUR NEWSLETTER FOR MORE DAILY UPDATES NOW"
    texts = {
        "a": "unique text one " + boiler + " tail a",
        "b": "other content " + boiler + " and more here",
        "c": "totally unrelated document with its own words only",
        "d": boiler + boiler,  # self-repeat inside one doc
    }
    L = 20
    assert _run(texts, L) == _brute(texts, L)


def test_dup_spans_random_bruteforce():
    rng = np.random.default_rng(17)
    alpha = "ab"  # tiny alphabet forces plenty of natural repeats
    texts = {
        f"d{i}": "".join(rng.choice(list(alpha), rng.integers(10, 120)))
        for i in range(30)
    }
    for L in (5, 12):
        assert _run(texts, L) == _brute(texts, L), L


def test_dup_spans_short_L_routing():
    # L < 8 exercises the padded route-key branch
    texts = {"a": "xyzxyzxyz", "b": "qqxyzqq"}
    assert _run(texts, 3) == _brute(texts, 3)


def test_dup_spans_no_cross_doc_windows():
    # identical halves placed so a window could only match if it crossed
    # the doc boundary in the concatenated batch buffer
    texts = {"a": "AAAABBBB", "b": "BBBBCCCC", "c": "zz"}
    L = 8
    got = _run(texts, L)
    assert got == _brute(texts, L) == {}


def test_remove_spans_matches_bruteforce():
    import ray

    boiler = "REPEATED BLOCK OF TEXT THAT APPEARS EVERYWHERE"
    texts = {
        "a": "start " + boiler + " middle " + boiler + " done",
        "b": "prefix " + boiler + " suffix",
        "c": "clean document with nothing repeated in it",
    }
    L = 20
    t = pa.table({"doc_id": list(texts), "text": list(texts.values())})
    ds = rd.from_arrow(t)
    spans_ds = dupspans.duplicated_spans(ds, L=L)
    spans = pa.concat_tables(ray.get(spans_ds.to_arrow_refs()),
                             promote_options="default")
    got = dupspans.remove_spans(rd.from_arrow(t), spans).to_pandas()
    got = got.set_index("doc_id")

    bf = _brute(texts, L)
    for d, txt in texts.items():
        mask = [True] * len(txt)
        removed = 0
        for ws, we, _ in bf.get(d, []):
            for p in range(ws - 1, we - 1):
                if mask[p]:
                    mask[p] = False
                    removed += 1
        want = "".join(ch for ch, m in zip(txt, mask) if m)
        assert got.loc[d, "clean_text"] == want, d
        assert got.loc[d, "removed_bytes"] == removed, d
    assert got.loc["c", "removed_bytes"] == 0
    assert (got["removed_bytes"] > 0).sum() >= 2


def test_forced_fingerprint_collision_rescued_by_confirm_pass(monkeypatch):
    """The fingerprint only PRUNES; exactness must come from the byte
    confirm pass.  Monkeypatch the fingerprint with a pathological
    constant (every window collides into one candidate bucket) and
    assert the spans still match brute force exactly."""
    monkeypatch.setattr(
        dupspans, "_fingerprint64",
        lambda win: np.zeros(len(win), dtype=np.uint64),
    )
    rng = np.random.default_rng(41)
    texts = {
        f"d{i}": "".join(rng.choice(list("abc"), rng.integers(8, 60)))
        for i in range(12)
    }
    texts["p1"] = "zz COMMON PLANTED BLOCK zz"
    texts["p2"] = "qq COMMON PLANTED BLOCK qq"
    L = 7
    assert _run(texts, L) == _brute(texts, L)


def test_dup_spans_nul_bytes_significant(monkeypatch):
    """Windows differing only in trailing NUL bytes must NOT be marked
    duplicated (the S-dtype compare bug: NUL padding stripped).  Force
    total fp collision so the byte compare alone decides."""
    monkeypatch.setattr(
        dupspans, "_fingerprint64",
        lambda win: np.zeros(len(win), dtype=np.uint64),
    )
    # 4-byte docs -> exactly one window each at L=4; "ab\x00\x00" vs
    # "ab\x00c" share an S-dtype prefix but differ bytewise
    t = pa.table({
        "doc_id": ["a", "b", "c", "d"],
        "text": ["ab\x00\x00", "ab\x00c", "ab\x00\x00", "xyzw"],
    })
    got = dupspans.duplicated_spans(
        rd.from_arrow(t).repartition(2), L=4
    ).to_pandas()
    assert sorted(got["doc_id"]) == ["a", "c"]  # b must NOT match a/c


def test_remove_spans_shuffled_path_matches_broadcast():
    """broadcast_limit=0 forces the co-shuffle path; output must equal
    the broadcast path bit for bit (including docs with no spans)."""
    boiler = "THE SAME BOILERPLATE SENTENCE AGAIN AND AGAIN"
    texts = {
        "a": "one " + boiler + " tail",
        "b": "two " + boiler + " more " + boiler,
        "c": "no duplication in this one at all",
        "n": None,
    }
    t = pa.table({"doc_id": list(texts),
                  "text": pa.array(list(texts.values()), pa.string())})
    ds = rd.from_arrow(t)
    spans_ds = dupspans.duplicated_spans(ds, L=16)
    want = (
        dupspans.remove_spans(rd.from_arrow(t), spans_ds)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    got = (
        dupspans.remove_spans(rd.from_arrow(t), spans_ds,
                              broadcast_limit=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert (want["removed_bytes"] > 0).sum() >= 2


def test_dup_spans_null_and_multibyte_robust():
    import ray

    # null text rows contribute nothing; a span boundary splitting a
    # multi-byte UTF-8 char must not crash removal (orphan bytes drop)
    boiler = "x" * 30
    t = pa.table({
        "doc_id": ["a", "b", "n", "u"],
        "text": pa.array(
            [boiler + "tail one", boiler + "tail two", None,
             "é" + boiler + "é"],  # 2-byte chars hug the dup region
            pa.string()),
    })
    ds = rd.from_arrow(t)
    spans_ds = dupspans.duplicated_spans(ds, L=10)
    spans = pa.concat_tables(ray.get(spans_ds.to_arrow_refs()),
                             promote_options="default")
    out = dupspans.remove_spans(rd.from_arrow(t), spans).to_pandas()
    out = out.set_index("doc_id")
    assert out.loc["n", "clean_text"] == ""  # null -> empty, no crash
    assert out.loc["a", "removed_bytes"] > 0
    # every clean_text is valid unicode (decode never raised)
    for s in out["clean_text"]:
        assert isinstance(s, str)


def test_remove_spans_non_string_ids_both_paths():
    """doc_id type must survive BOTH execution paths unchanged (the
    shuffled path used to force-cast ids to string)."""
    boiler = "y" * 24
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": [f"a {boiler} a", f"b {boiler} b", "nothing repeated here"],
    })
    ds = rd.from_arrow(t)
    spans_ds = dupspans.duplicated_spans(ds, L=12)
    bcast = (dupspans.remove_spans(rd.from_arrow(t), spans_ds)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    shuf = (dupspans.remove_spans(rd.from_arrow(t), spans_ds,
                                  broadcast_limit=0)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(shuf, bcast)
    assert bcast["doc_id"].dtype.kind == "i"
    assert bcast.loc[2, "removed_bytes"] == 0
    assert (bcast["removed_bytes"] > 0).sum() == 2


def test_gram_matrix_multi_chunk_and_large_binary():
    """_gram_matrix must reshape per chunk (never combine_chunks — int32
    offset overflow on >2GiB partitions) and accept large_binary."""
    L = 6
    g1 = pa.array([b"abcdef", b"ghijkl"], pa.binary())
    g2 = pa.array([b"mnopqr"], pa.binary())
    chunked = pa.chunked_array([g1, g2])
    got = dupspans._gram_matrix(chunked)
    want = np.frombuffer(b"abcdefghijklmnopqr", dtype=np.uint8).reshape(3, L)
    np.testing.assert_array_equal(got, want)
    # sliced chunk (nonzero offset) and large_binary offsets
    got2 = dupspans._gram_matrix(g1.slice(1, 1))
    np.testing.assert_array_equal(
        got2, np.frombuffer(b"ghijkl", dtype=np.uint8).reshape(1, L))
    lg = pa.array([b"stuvwx", b"yz0123"], pa.large_binary())
    got3 = dupspans._gram_matrix(lg)
    np.testing.assert_array_equal(
        got3, np.frombuffer(b"stuvwxyz0123", dtype=np.uint8).reshape(2, L))
