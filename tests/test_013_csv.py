"""CSV ingest source (S2/S3/S4): corrupt-row survival, gz handling, and
exact parity with the parquet path on the same logical rows."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aisdb_ray.sources.csv import read_token_csv, write_token_csv


@pytest.fixture(scope="module")
def csv_dir(small_dir, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("csv_ingest"))
    # fresh dir per run -> no _SUCCESS marker yet; corruption every 50 rows
    return write_token_csv(small_dir, out, corrupt_every=50, gzip_last=True)


def _parquet_table(small_dir) -> pa.Table:
    from aisdb_ray.state.lineage import list_parquet_files

    tabs = [pq.read_table(f) for f in list_parquet_files(small_dir)]
    return pa.concat_tables(tabs)


def test_csv_matches_parquet_rows(csv_dir, small_dir):
    got = read_token_csv(csv_dir).to_arrow_refs()
    import ray

    got = pa.concat_tables([ray.get(r) for r in got])
    want = _parquet_table(small_dir)
    assert got.num_rows == want.num_rows  # every injected corrupt line dropped

    g = got.sort_by("doc_id")
    w = want.select(got.column_names).sort_by("doc_id")
    assert g["doc_id"].to_pylist() == w["doc_id"].to_pylist()
    assert g["n_tok"].to_pylist() == w["n_tok"].to_pylist()
    assert g["source"].to_pylist() == w["source"].to_pylist()
    # token payload round-trips the string codec exactly
    assert g["tokens"].to_pylist() == w["tokens"].to_pylist()
    assert g.schema.field("tokens").type == pa.list_(pa.int32())
    assert g.schema.field("n_tok").type == pa.int32()


def test_csv_gz_files_present(csv_dir):
    names = os.listdir(csv_dir)
    assert any(n.endswith(".csv.gz") for n in names)
    assert any(n.endswith(".csv") and not n.endswith(".gz") for n in names)


def test_csv_empty_tokens_survive(tmp_path):
    # an empty token string is a zero-length list, not a parser crash
    p = tmp_path / "edge.csv"
    p.write_text(
        "doc_id,tokens,n_tok,source\n"
        "s0:0000000001:0000,,0,s0\n"
        "s0:0000000002:0000,5 6,2,s0\n"
    )
    t = read_token_csv(str(p)).to_pandas()
    t = t.sort_values("doc_id").reset_index(drop=True)
    assert list(t["tokens"][0]) == []
    assert list(t["tokens"][1]) == [5, 6]


def test_csv_ingest_equals_ts_clean(csv_dir, small_dir):
    """The full ingest pipeline over CSV == the parquet-path clean output."""
    from aisdb_ray.stages import prepare, series

    def _clean(ds):
        return series.clean_series(
            ds.map_batches(prepare.prepare, batch_format="pyarrow"), 7200
        ).select_columns(["source", "doc_id", "time", "seq", "n_tok", "seg"])

    import ray.data as rd

    got = _clean(read_token_csv(csv_dir)).to_pandas()
    want = _clean(rd.read_parquet(small_dir)).to_pandas()
    key = ["source", "doc_id"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert got.equals(want)


def test_csv_oversized_token_skipped_not_crash(tmp_path):
    # a >9-digit token would overflow int32: the row must DROP, not crash
    p = tmp_path / "big.csv"
    p.write_text(
        "doc_id,tokens,n_tok,source\n"
        "s0:0000000001:0000,4294967296,1,s0\n"
        "s0:0000000002:0000,7 8,2,s0\n"
    )
    t = read_token_csv(str(p)).to_pandas()
    assert len(t) == 1 and list(t["tokens"][0]) == [7, 8]


def test_csv_round_trip_large_ids_and_quoting(tmp_path):
    """Token ids in [1e9, 2^31-1] must survive the CSV round trip (the
    9-digit regex silently dropped them), and doc_ids containing commas
    must be quoted on write, not silently skipped on read."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aisdb_ray.sources import csv as csvsrc

    t = pa.table({
        "doc_id": ["plain-1", 'we,ird "id"'],
        "tokens": pa.array([[2_000_000_000, 5], [7]], pa.list_(pa.int32())),
        "n_tok": pa.array([2, 1], pa.int32()),
        "source": ["s1", "s,2"],
    })
    src = tmp_path / "pq"
    src.mkdir()
    pq.write_table(t, str(src / "part-0.parquet"))
    out = csvsrc.write_token_csv(str(src), str(tmp_path / "csv"),
                                 gzip_last=False)
    got = (csvsrc.read_token_csv(out).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(got) == 2
    assert list(got.loc[got["doc_id"] == "plain-1", "tokens"].iloc[0]) == [
        2_000_000_000, 5]
    assert 'we,ird "id"' in set(got["doc_id"])
    assert "s,2" in set(got["source"])


def test_csv_negative_tokens_round_trip(tmp_path):
    """Negative int32 tokens are valid in the JSONL/IPC/parquet paths;
    the CSV token regex must accept them too (it used to drop the row)."""
    t = pa.table({
        "doc_id": pa.array(["d1", "d2"]),
        "tokens": pa.array([[-5, 3], [-2147483648, 2147483647]],
                           pa.list_(pa.int32())),
        "n_tok": pa.array([2, 2], pa.int32()),
        "source": pa.array(["s", "s"]),
    })
    src = tmp_path / "pq"
    src.mkdir()
    pq.write_table(t, str(src / "p.parquet"))
    out = write_token_csv(str(src), str(tmp_path / "csv"), gzip_last=False)
    got = read_token_csv(out).to_pandas().sort_values("doc_id")
    assert len(got) == 2
    assert list(got.tokens.iloc[0]) == [-5, 3]
    assert list(got.tokens.iloc[1]) == [-2147483648, 2147483647]


def test_csv_writer_null_fields_do_not_crash(tmp_path):
    """Null doc_id/source/tokens/n_tok serialize as empty CSV fields (CSV
    has no null) instead of crashing the line join; the reader's skip-bad
    gate drops the unparseable-n_tok row."""
    t = pa.table({
        "doc_id": pa.array([None, "d2"], pa.string()),
        "tokens": pa.array([[1, 2], None], pa.list_(pa.int32())),
        "n_tok": pa.array([2, None], pa.int32()),
        "source": pa.array(["s", None], pa.string()),
    })
    src = tmp_path / "pq"
    src.mkdir()
    pq.write_table(t, str(src / "p.parquet"))
    out = write_token_csv(str(src), str(tmp_path / "csv"), gzip_last=False)
    got = read_token_csv(out).to_pandas()
    # row 2 has no parseable n_tok -> dropped; row 1 survives with "" id
    assert len(got) == 1 and list(got.tokens.iloc[0]) == [1, 2]
