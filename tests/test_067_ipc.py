"""Arrow IPC source: round-trip, whole-file quarantine, wrong-format
rejection."""

from __future__ import annotations

import io
import os

import numpy as np
import pyarrow as pa
import pyarrow.ipc as ipc
import pytest

from aisdb_ray.sources.ipc import TOKEN_SCHEMA, read_token_ipc


def _tok_table(n, seed=0):
    rng = np.random.default_rng(seed)
    return pa.table({
        "doc_id": [f"s:100{i}:{i}" for i in range(n)],
        "tokens": pa.array([rng.integers(0, 99, 4).tolist()
                            for _ in range(n)], pa.list_(pa.int32())),
        "n_tok": pa.array([4] * n, pa.int32()),
        "source": ["s"] * n,
    })


def _write(path, tbl):
    buf = io.BytesIO()
    with ipc.new_file(buf, TOKEN_SCHEMA) as w:
        w.write_table(tbl.cast(TOKEN_SCHEMA))
    with open(path, "wb") as o:
        o.write(buf.getvalue())
    return buf.getvalue()


def test_ipc_roundtrip_and_quarantine(tmp_path):
    d = tmp_path / "ipc"
    d.mkdir()
    t1, t2 = _tok_table(7, 1), _tok_table(5, 2)
    data = _write(str(d / "a.arrow"), t1)
    _write(str(d / "b.arrow"), t2)
    # junk: pure garbage + truncated copy — both must quarantine whole
    (d / "junk1.arrow").write_bytes(b"garbage" * 100)
    (d / "junk2.arrow").write_bytes(data[: len(data) // 3])

    out = read_token_ipc(str(d)).to_pandas()
    assert len(out) == 12
    assert set(out.columns) == {"doc_id", "tokens", "n_tok", "source"}
    # token arrays survive byte-exact
    got = out.sort_values("doc_id")
    want = pa.concat_tables([t1, t2]).to_pandas().sort_values("doc_id")
    for a, b in zip(got["tokens"], want["tokens"]):
        assert list(a) == list(b)


def test_ipc_stream_format_also_reads(tmp_path):
    p = tmp_path / "s.arrow"
    t = _tok_table(3, 3)
    buf = io.BytesIO()
    with ipc.new_stream(buf, TOKEN_SCHEMA) as w:  # STREAM, not file
        w.write_table(t.cast(TOKEN_SCHEMA))
    p.write_bytes(buf.getvalue())
    out = read_token_ipc(str(p)).to_pandas()
    assert len(out) == 3


def test_ipc_rejects_wrong_format(tmp_path):
    d = tmp_path / "mix"
    d.mkdir()
    _write(str(d / "ok.arrow"), _tok_table(2, 4))
    (d / "stray.csv").write_text("a,b\n1,2\n")
    with pytest.raises(ValueError):
        read_token_ipc(str(d))
    with pytest.raises(ValueError):
        read_token_ipc(str(d / "stray.csv"))
