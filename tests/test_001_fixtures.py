"""Fixture generator invariants (FIXTURES.md §1-2)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from aisdb_ray.fixtures import SCALES, build_token_table
from aisdb_ray.schema import INPUT_SCHEMA


def test_schema_matches_input_hint(micro_table):
    assert micro_table.schema.equals(INPUT_SCHEMA)


def test_deterministic():
    a = build_token_table("t0-micro")
    b = build_token_table("t0-micro")
    assert a.equals(b)


def test_anomalies_present(micro_df):
    df = micro_df
    p = SCALES["t0-micro"]
    # duplicates
    assert df.duplicated(subset=["doc_id"]).sum() > 0
    # invalid rows (n_tok <= 0 or len mismatch)
    bad = (df["n_tok"] <= 0) | (df["tokens"].map(len) != df["n_tok"])
    assert bad.sum() > 0
    # hot source holds roughly hot_frac of rows
    share = df["source"].value_counts(normalize=True).iloc[0]
    assert 0.2 < share < 0.45
    # at least one length-1 source
    assert (df["source"].value_counts() == 1).sum() >= p.n_single


def test_doc_id_encodes_epoch(micro_df):
    row = micro_df.iloc[0]
    src, epoch, seq = row["doc_id"].rsplit(":", 2)
    assert src == row["source"]
    assert len(epoch) == 10 and epoch.isdigit()
    assert len(seq) == 4 and seq.isdigit()


def test_tokens_are_int32_lists(micro_table):
    assert micro_table.schema.field("tokens").type == pa.list_(pa.int32())
    flat = micro_table["tokens"].combine_chunks().flatten().to_numpy()
    assert flat.dtype == np.int32
    assert flat.min() >= 0


def test_prepare_out_of_int32_seq_nulls_not_crashes():
    """A seq past int32 passes the digit regex but must null (skip-bad),
    not ArrowInvalid the whole batch."""
    import pyarrow as pa

    from aisdb_ray.stages import prepare

    t = pa.table({
        "doc_id": pa.array(["s:100:1", "s:200:9999999999"]),
        "tokens": pa.array([[1], [2]], pa.list_(pa.int32())),
        "n_tok": pa.array([1, 1], pa.int32()),
        "source": pa.array(["s", "s"]),
    })
    out = prepare.prepare(t)
    assert out.num_rows == 1  # the oversized-seq row dropped, not a crash
    assert out["seq"].to_pylist() == [1]


def test_oracle_edge_inputs_do_not_crash():
    """Oracle helpers must honor their documented skip-bad contracts on
    degenerate frames: empty, colonless ids, null tokens, null mode keys."""
    import pandas as pd

    from aisdb_ray import oracle

    empty = pd.DataFrame({"doc_id": pd.Series([], dtype=str),
                          "tokens": pd.Series([], dtype=object),
                          "n_tok": pd.Series([], dtype=np.int64),
                          "source": pd.Series([], dtype=str)})
    assert len(oracle.clean(empty)) == 0
    assert len(oracle.add_segments(oracle.clean(empty), 3600)) == 0

    bad = pd.DataFrame({"doc_id": ["abc", "s:100:1"],
                        "tokens": [None, [1]],
                        "n_tok": [1, 1],
                        "source": ["s", "s"]})
    got = oracle.clean(bad)
    assert list(got.doc_id) == ["s:100:1"]  # colonless + null tokens drop

    m = oracle.mode_per_key(
        pd.DataFrame({"k": ["a", None, None], "v": [1, 2, 2]}), "k", "v")
    # null-key group kept (engine parity); null VALUES would be filtered
    assert len(m) == 2
    assert int(m[m.k.isna()].mode_value.iloc[0]) == 2


def test_fixture_row_counts_exact_and_single_source():
    from aisdb_ray.fixtures import FixtureParams, _source_row_counts

    rng = np.random.default_rng(0)
    p = FixtureParams(n_rows=100, n_sources=64, n_single=4)
    c = _source_row_counts(p, rng)
    assert int(c.sum()) == 100  # maximum-after-remainder used to inflate
    p1 = FixtureParams(n_rows=10, n_sources=1, n_single=0, hot_frac=1.0)
    assert list(_source_row_counts(p1, rng)) == [10]
