"""JSONL ingest source: corrupt-line survival (bisecting C-parse
quarantine), gz handling, and exact parity with the parquet path."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aisdb_ray.sources.jsonl import read_token_jsonl, write_token_jsonl


@pytest.fixture(scope="module")
def jsonl_dir(small_dir, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("jsonl_ingest"))
    return write_token_jsonl(small_dir, out, corrupt_every=50, gzip_last=True)


def _parquet_table(small_dir) -> pa.Table:
    from aisdb_ray.state.lineage import list_parquet_files

    tabs = [pq.read_table(f) for f in list_parquet_files(small_dir)]
    return pa.concat_tables(tabs)


def test_jsonl_matches_parquet_rows(jsonl_dir, small_dir):
    import ray

    got = pa.concat_tables(
        [ray.get(r) for r in read_token_jsonl(jsonl_dir).to_arrow_refs()]
    )
    want = _parquet_table(small_dir)
    assert got.num_rows == want.num_rows  # every injected corrupt line dropped

    g = got.sort_by("doc_id")
    w = want.select(got.column_names).sort_by("doc_id")
    assert g["doc_id"].to_pylist() == w["doc_id"].to_pylist()
    assert g["n_tok"].to_pylist() == w["n_tok"].to_pylist()
    assert g["source"].to_pylist() == w["source"].to_pylist()
    assert g["tokens"].to_pylist() == w["tokens"].to_pylist()
    assert g.schema.field("tokens").type == pa.list_(pa.int32())
    assert g.schema.field("n_tok").type == pa.int32()


def test_jsonl_gz_files_present(jsonl_dir):
    names = os.listdir(jsonl_dir)
    assert any(n.endswith(".jsonl.gz") for n in names)


def test_jsonl_corrupt_shapes_skipped(tmp_path):
    """Each corrupt shape drops exactly its own line: broken syntax, wrong
    field type, non-int token element, blank line, out-of-int32 values."""
    p = tmp_path / "x.jsonl"
    rows = [
        {"doc_id": "s:0000000010:0001", "tokens": [1, 2], "n_tok": 2,
         "source": "s"},
        {"doc_id": "s:0000000020:0002", "tokens": [], "n_tok": 0,
         "source": "s"},
    ]
    lines = [json.dumps(rows[0]), '{"broken json', "",
             json.dumps({**rows[0], "n_tok": "x"}),
             json.dumps({**rows[0], "tokens": [1, "NaN"]}),
             json.dumps({**rows[0], "tokens": [2**40]}),
             json.dumps({**rows[0], "n_tok": 2**40}),
             json.dumps(rows[1])]
    p.write_text("\n".join(lines) + "\n")
    got = read_token_jsonl(str(p)).to_pandas().sort_values(
        "doc_id"
    ).reset_index(drop=True)
    assert got["doc_id"].tolist() == [
        "s:0000000010:0001", "s:0000000020:0002"
    ]
    assert list(got["tokens"].tolist()[0]) == [1, 2]
    assert list(got["tokens"].tolist()[1]) == []


def test_jsonl_null_token_elements_rejected_deterministically(tmp_path):
    """A row whose tokens list contains null must be dropped regardless
    of whether its batch also contains corrupt lines (the fast path used
    to keep it, the classifier path to drop it)."""
    import ray.data as rd

    from aisdb_ray.sources import jsonl as jsrc

    p = tmp_path / "a.jsonl"
    p.write_text(
        '{"doc_id":"ok","tokens":[1,2],"n_tok":2,"source":"s"}\n'
        '{"doc_id":"bad","tokens":[1,null,3],"n_tok":3,"source":"s"}\n'
    )
    got = jsrc.read_token_jsonl(str(p)).to_pandas()
    assert got["doc_id"].tolist() == ["ok"]

    p2 = tmp_path / "b.jsonl"
    p2.write_text(
        '{"doc_id":"ok","tokens":[1,2],"n_tok":2,"source":"s"}\n'
        '{"doc_id":"bad","tokens":[1,null,3],"n_tok":3,"source":"s"}\n'
        'not json at all\n'
    )
    got2 = jsrc.read_token_jsonl(str(p2)).to_pandas()
    assert got2["doc_id"].tolist() == ["ok"]


def test_jsonl_rejects_non_jsonl_inputs(tmp_path):
    import pytest

    from aisdb_ray.sources import jsonl as jsrc

    (tmp_path / "only.csv").write_text("a,b\n")
    with pytest.raises(ValueError, match="non-JSONL|no .jsonl"):
        jsrc.read_token_jsonl(str(tmp_path))
    empty = tmp_path / "emptydir"
    empty.mkdir()
    with pytest.raises(ValueError, match="no .jsonl"):
        jsrc.read_token_jsonl(str(empty))


def test_jsonl_writer_null_tokens_and_ntok_do_not_crash(tmp_path):
    """Null tokens/n_tok must route the chunk through the json.dumps
    fallback (the fast path would assemble a None line and crash)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aisdb_ray.sources.jsonl import read_token_jsonl, write_token_jsonl

    t = pa.table({
        "doc_id": pa.array(["d1", "d2"]),
        "tokens": pa.array([[1, 2], None], pa.list_(pa.int32())),
        "n_tok": pa.array([2, None], pa.int32()),
        "source": pa.array(["s", "s"]),
    })
    src = tmp_path / "pq"
    src.mkdir()
    pq.write_table(t, str(src / "p.parquet"))
    out = write_token_jsonl(str(src), str(tmp_path / "jl"), gzip_last=False)
    got = read_token_jsonl(out).to_pandas()
    assert len(got) >= 1  # d1 survives; the null row follows skip-bad
