"""Incremental continuous-aggregate refresh (cascade._refresh_parts):
appended input files rebuild ONLY the hash partitions their sources touch,
and the refreshed outputs equal a from-scratch run over the combined input.
Modified/deleted inputs still force a clean restart."""

from __future__ import annotations

import json
import os
import shutil
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aisdb_ray.pipelines import cascade

MAX_GAP = 7200
NUM_PARTS = 4


def _cfg(inp: str, out: str) -> cascade.CascadeConfig:
    return cascade.CascadeConfig(
        input_path=inp, out_root=out, num_parts=NUM_PARTS, max_gap=MAX_GAP,
        gapfill=True, compress=True, max_concurrent_parts=2,
    )


def _mk_rows(source: str, times: list[int], seqs: list[int]) -> pa.Table:
    n_tok = np.asarray([(t % 97) + 3 for t in times], dtype=np.int32)
    return pa.table(
        {
            "doc_id": pa.array(
                [f"{source}:{t:010d}:{s:04d}" for t, s in zip(times, seqs)]
            ),
            "tokens": pa.array(
                [list(range(int(k))) for k in n_tok], pa.list_(pa.int32())
            ),
            "n_tok": pa.array(n_tok),
            "source": pa.array([source] * len(times)),
        }
    )


def _stage_df(run_dir: str, stage: str, columns=None) -> pd.DataFrame:
    from aisdb_ray.state.lineage import list_parquet_files

    files = list_parquet_files(os.path.join(run_dir, stage))
    tabs = [pq.read_table(f, columns=columns) for f in files]
    return pa.concat_tables(tabs, promote_options="default").to_pandas()


def _part_file_mtimes(run_dir: str, stage: str) -> dict[str, float]:
    from aisdb_ray.state.lineage import list_parquet_files

    out = {}
    for label, d in cascade._tier_part_dirs(run_dir, stage):
        files = list_parquet_files(d)
        out[label] = max(os.stat(f).st_mtime_ns for f in files) if files else 0
    return out


@pytest.fixture(scope="module")
def env(micro_dir, tmp_path_factory):
    """gen-0 input copy + completed cascade + the appended increment."""
    base = tmp_path_factory.mktemp("refresh")
    inp = str(base / "input")
    out = str(base / "run")
    os.makedirs(inp)
    for f in os.listdir(micro_dir):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(micro_dir, f), os.path.join(inp, f))

    summary0 = cascade.run_cascade(_cfg(inp, out))
    assert summary0["rows"] > 0 and "refresh" not in summary0

    # choose an existing source and a NEW source that hash to the SAME
    # partition, so exactly one of the four partitions is affected
    series = _stage_df(out, "series", columns=["source", "time"])
    src_a = sorted(series["source"].unique())[0]
    part_a = zlib.crc32(src_a.encode()) % NUM_PARTS
    new_src = next(
        f"novel-{i}" for i in range(100)
        if zlib.crc32(f"novel-{i}".encode()) % NUM_PARTS == part_a
    )

    ta = np.sort(series.loc[series["source"] == src_a, "time"].to_numpy())
    gaps = np.flatnonzero(np.diff(ta) >= MAX_GAP)
    frontier = int(ta.max())
    inc_times, inc_seqs = [], []
    # frontier append (the common continuous-ingest shape)
    for k in range(1, 6):
        inc_times.append(frontier + 60 * k)
        inc_seqs.append(0)
    # a row INSIDE a long gap: merges two previously-split segments
    if len(gaps):
        mid = int((ta[gaps[0]] + ta[gaps[0] + 1]) // 2)
        inc_times.append(mid)
        inc_seqs.append(0)
    inc = _mk_rows(src_a, inc_times, inc_seqs)

    # exact duplicates of existing rows: dedup keep-first must absorb them
    orig = pa.concat_tables(
        [pq.read_table(os.path.join(inp, f)) for f in sorted(os.listdir(inp))
         if f.endswith(".parquet")]
    )
    dup = orig.filter(
        pa.compute.equal(orig["source"], src_a)
    ).slice(0, 5).select(["doc_id", "tokens", "n_tok", "source"])

    brand = _mk_rows(new_src, [frontier + 60 * k for k in range(1, 4)], [0, 0, 0])

    pq.write_table(
        pa.concat_tables([inc.cast(dup.schema), dup, brand.cast(dup.schema)]),
        os.path.join(inp, "part-increment.parquet"),
    )
    return {
        "inp": inp, "out": out, "part_a": part_a,
        "mtimes": {
            s: _part_file_mtimes(out, s)
            for s in ["series", "tier_1m", "tier_1h", "tier_1d",
                      "gapfill", "compressed"]
        },
    }


@pytest.fixture(scope="module")
def refreshed(env):
    summary = cascade.run_cascade(_cfg(env["inp"], env["out"]))
    assert summary.get("refresh", {}).get("new_files") == 1
    return summary


@pytest.fixture(scope="module")
def scratch(env, refreshed, tmp_path_factory):
    """From-scratch run over the combined input — the refresh oracle."""
    out2 = str(tmp_path_factory.mktemp("refresh_scratch"))
    cascade.run_cascade(_cfg(env["inp"], out2))
    return out2


def test_refresh_affects_one_partition(env, refreshed):
    assert refreshed["refresh"]["affected_parts"] == [env["part_a"]]


def test_refresh_matches_full_recompute(env, refreshed, scratch):
    sort_keys = {
        "series": ["source", "time", "seq"],
        "tier_1m": ["source", "bucket"],
        "tier_1h": ["source", "bucket"],
        "tier_1d": ["source", "bucket"],
        "gapfill": ["source", "seg", "time"],
        "compressed": ["source", "chunk"],
    }
    for stage, keys in sort_keys.items():
        a = _stage_df(env["out"], stage)
        b = _stage_df(scratch, stage)
        a = a[sorted(a.columns)].sort_values(keys, kind="stable").reset_index(drop=True)
        b = b[sorted(b.columns)].sort_values(keys, kind="stable").reset_index(drop=True)
        assert len(a) == len(b), stage
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            np.testing.assert_array_equal(av, bv, err_msg=f"{stage}.{c}")


def test_refresh_summary_metrics_match_scratch(refreshed, scratch, env):
    s2 = cascade.run_cascade(_cfg(env["inp"], scratch))  # noop reread of summary
    assert refreshed["rows"] == s2["rows"]
    assert refreshed["tokens"] == s2["tokens"]


def test_unaffected_partitions_not_rewritten(env, refreshed):
    for stage, before in env["mtimes"].items():
        after = _part_file_mtimes(env["out"], stage)
        for label, m in before.items():
            if label != str(env["part_a"]):
                assert after[label] == m, f"{stage} part {label} was rewritten"


def test_rerun_after_refresh_is_noop(env, refreshed):
    man = os.path.join(env["out"], "manifest.jsonl")
    n_before = sum(1 for l in open(man) if l.strip())
    summary = cascade.run_cascade(_cfg(env["inp"], env["out"]))
    assert "refresh" not in summary
    assert sum(1 for l in open(man) if l.strip()) == n_before


def test_crash_recovery_mid_swap(env, refreshed, tmp_path_factory):
    """Simulate a refresh SIGKILLed between the two partition renames: the
    live series dir is gone and only '<dir>.old' holds the durable copy.
    The next refresh must restore it BEFORE unioning, or every pre-existing
    row of that partition would silently vanish."""
    inp, out, part_a = env["inp"], env["out"], env["part_a"]

    # a second increment for the same source keeps part_a the affected part
    series = _stage_df(out, "series", columns=["source", "time"])
    src_a = sorted(series["source"].unique())[0]
    frontier = int(series.loc[series["source"] == src_a, "time"].max())
    inc2 = _mk_rows(src_a, [frontier + 60, frontier + 120], [0, 0])
    pq.write_table(inc2, os.path.join(inp, "part-increment2.parquet"))

    # reproduce the crash window: live dir displaced to .old, nothing else
    live = cascade._part_dir(out, "series", part_a)
    os.replace(live, live + ".old")
    assert not os.path.isdir(live)

    summary = cascade.run_cascade(_cfg(inp, out))
    assert summary["refresh"]["affected_parts"] == [part_a]
    assert os.path.isdir(live) and not os.path.isdir(live + ".old")

    out2 = str(tmp_path_factory.mktemp("crash_scratch"))
    cascade.run_cascade(_cfg(inp, out2))
    a = _stage_df(out, "series").sort_values(
        ["source", "time", "seq"], kind="stable").reset_index(drop=True)
    b = _stage_df(out2, "series").sort_values(
        ["source", "time", "seq"], kind="stable").reset_index(drop=True)
    assert len(a) == len(b)
    for c in ["source", "time", "seq", "n_tok", "seg", "doc_id"]:
        np.testing.assert_array_equal(a[c].to_numpy(), b[c].to_numpy(), err_msg=c)


def test_modified_input_forces_clean_restart(env, refreshed, scratch):
    # rewrite (not append) one recorded input file -> generations can't mix
    inp = env["inp"]
    victim = os.path.join(inp, sorted(
        f for f in os.listdir(inp) if f.endswith(".parquet")
    )[0])
    t = pq.read_table(victim)
    pq.write_table(t.slice(0, t.num_rows - 1), victim)
    man = os.path.join(env["out"], "manifest.jsonl")
    hdr_before = json.loads(open(man).readline())
    summary = cascade.run_cascade(_cfg(inp, env["out"]))
    hdr_after = json.loads(open(man).readline())
    assert hdr_after["ts"] > hdr_before["ts"]  # manifest was recreated
    assert summary["rows"] > 0 and "refresh" not in summary
