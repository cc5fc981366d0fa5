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
