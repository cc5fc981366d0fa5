"""DSIR importance weights (integer-quantized)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from aisdb_ray.stages.dsir import dsir_weights


def _docs(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array([r[2] for r in rows]),
            }
        )
    )


def _en_pred():
    # nested so cloudpickle ships it by value (test modules are not
    # importable inside Ray workers)
    def target(b: pa.Table) -> pa.Array:
        m = pc.equal(b["lang"], pa.scalar("en"))
        return m.combine_chunks() if isinstance(m, pa.ChunkedArray) else m

    return target


def test_dsir_prefers_target_vocabulary():
    # target docs repeat "alpha beta"; raw-only docs use "zork quux".
    # a fresh doc made of target bigrams must outscore one of raw bigrams.
    rows = [(i, "alpha beta " * 8, "en") for i in range(8)]
    rows += [(100 + i, "zork quux " * 8, "zh") for i in range(8)]
    rows += [(900, "alpha beta alpha beta", "zh"),
             (901, "zork quux zork quux", "zh")]
    out = dsir_weights(_docs(rows), _en_pred(), n_buckets=256).to_pandas()
    w = dict(zip(out["doc_id"], out["dsir_fx"]))
    n = dict(zip(out["doc_id"], out["n_feats"]))
    assert n[900] == 3 and n[901] == 3
    assert w[900] > w[901]


def test_dsir_short_docs_emit_nothing():
    rows = [(1, "solo", "en"), (2, "", "en"), (3, "two words", "zh")]
    out = dsir_weights(_docs(rows), _en_pred(), n_buckets=64).to_pandas()
    assert out["doc_id"].tolist() == [3]
    assert out["n_feats"].tolist() == [1]


def test_dsir_n_feats_counts_occurrences():
    rows = [(1, "a b a b a", "en")]  # bigrams: ab ba ab ba -> 4 occurrences
    out = dsir_weights(_docs(rows), _en_pred(), n_buckets=64).to_pandas()
    assert out["n_feats"].tolist() == [4]
