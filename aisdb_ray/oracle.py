"""Plain NumPy/pandas oracle for the engine's core semantics (no Ray).

Every distributed operator is tested against these single-threaded
implementations on small fixtures, mirroring how the reference pins semantics
with closed-form / micro-golden checks
(/root/reference/aisdb/tests/test_008_interp.py:66-121,
/root/reference/aisdb/track_gen.py:139-142).

Semantics encoded here (with their reference anchors):
- epoch derivation from doc_id              (decode.rs:60-114 spirit)
- validity filter: n_tok > 0 and len(tokens) == n_tok   (decode survival,
  decode.rs:446-485)
- exact dedup keep-first on (source, doc_id)            (PK ON CONFLICT DO
  NOTHING, aisdb_sql/insert_dynamic_clusteredidx.sql:16)
- per-source time sort                                  (ORDER BY 1,2,
  database/sqlfcn.py:58)
- gap segmentation: split where dt >= max_gap           (split_timedelta,
  track_gen.py:167-204; split indices proc_util.py:53-58)
- gap-fill: epoch grid np.arange(t0, t_end+step, step) + np.interp of n_tok;
  same-timestamp dedup keep-first; length<2 segments skipped
  (interp.py:25-41, 275-277, 98-100)
- tier rollups min/max/mean/count(+sum) per (source, bucket), tier-from-tier
  reaggregation                                          (network_graph.py:84-210,
  TimescaleDB continuous-aggregate semantics)
- mode aggregate with deterministic tie-break            (dbconn.py:110-197)
"""

from __future__ import annotations

import numpy as np
import pandas as pd


# ---------------------------------------------------------------- prepare

def derive_time(df: pd.DataFrame) -> pd.DataFrame:
    """Parse epoch + seq out of doc_id ('src:EEEEEEEEEE:SSSS'). Unparsable -> NaN."""
    parts = df["doc_id"].str.rsplit(":", n=2, expand=True)
    # expand=True emits only as many columns as the MAX split count: an
    # empty frame or an all-colonless corpus yields fewer than 3 columns
    # and parts[1] would KeyError instead of honoring "unparsable -> NaN"
    for c in (1, 2):
        if c not in parts.columns:
            parts[c] = np.nan
    out = df.copy()
    out["time"] = pd.to_numeric(parts[1], errors="coerce")
    out["seq"] = pd.to_numeric(parts[2], errors="coerce")
    return out


def valid_mask(df: pd.DataFrame) -> pd.Series:
    ntok_ok = df["n_tok"] > 0
    # null tokens cells are invalid rows, not a len(None) TypeError (the
    # engine's ingest hardening treats them the same way)
    len_ok = df["tokens"].map(
        lambda tk: len(tk) if tk is not None else -1) == df["n_tok"]
    time_ok = df["time"].notna() & df["seq"].notna()
    return ntok_ok & len_ok & time_ok


def clean(df: pd.DataFrame) -> pd.DataFrame:
    """derive -> validate -> dedup keep-first (source, doc_id) -> sort.

    Output sorted by (source, time, seq); time/seq cast to int64/int32.
    """
    d = derive_time(df)
    d = d[valid_mask(d)]
    d = d.drop_duplicates(subset=["source", "doc_id"], keep="first")
    d = d.astype({"time": np.int64, "seq": np.int32})
    return d.sort_values(["source", "time", "seq"], kind="stable").reset_index(drop=True)


# ---------------------------------------------------------------- segmentation

def add_segments(cleaned: pd.DataFrame, max_gap: int) -> pd.DataFrame:
    """Append int64 'seg': increments where within-source dt >= max_gap."""
    d = cleaned.copy()
    if len(d) == 0:  # np.r_[True, ...] is length-1 on empty input
        d["seg"] = np.array([], dtype=np.int64)
        return d
    t = d["time"].to_numpy()
    src = d["source"].to_numpy()
    new_src = np.r_[True, src[1:] != src[:-1]]
    dt = np.r_[0, np.diff(t)]
    boundary = new_src | (dt >= max_gap)
    # seg id restarts at 0 per source: cumulative boundaries minus value at source start
    cum = np.cumsum(boundary)
    start_cum = np.where(new_src, cum, 0)
    start_cum = np.maximum.accumulate(start_cum)
    d["seg"] = (cum - start_cum).astype(np.int64)
    return d


def segment_table(cleaned: pd.DataFrame, max_gap: int) -> pd.DataFrame:
    """(source, seg, t_start, t_end, n_rows) — the split_timedelta summary."""
    d = add_segments(cleaned, max_gap)
    g = d.groupby(["source", "seg"], sort=True)["time"]
    out = g.agg(t_start="min", t_end="max", n_rows="count").reset_index()
    return out.astype({"t_start": np.int64, "t_end": np.int64, "n_rows": np.int64})


# ---------------------------------------------------------------- gap-fill

def gapfill(cleaned: pd.DataFrame, step: int, max_gap: int) -> pd.DataFrame:
    """Linear gap-fill per (source, seg) on the reference's epoch grid.

    Output: (source, seg, time, n_tok float64, is_original bool), sorted by
    (source, seg, time). Original epochs on the grid round-trip their exact
    n_tok (np.interp at a sample point returns the sample). Same-second rows
    dedup keep-first before interpolation; segments with <2 unique timestamps
    are dropped (interp.py:98-100 warns and skips).
    """
    d = add_segments(cleaned, max_gap)
    rows = []
    for (srcv, segv), g in d.groupby(["source", "seg"], sort=True):
        g = g.drop_duplicates(subset=["time"], keep="first")
        t = g["time"].to_numpy(np.int64)
        if len(t) < 2:
            continue
        v = g["n_tok"].to_numpy(np.float64)
        grid = np.arange(t[0], t[-1] + step, step, dtype=np.int64)
        vi = np.interp(grid, t, v)
        orig = np.isin(grid, t)
        rows.append(
            pd.DataFrame(
                {
                    "source": srcv,
                    "seg": segv,
                    "time": grid,
                    "n_tok": vi,
                    "is_original": orig,
                }
            )
        )
    if not rows:
        return pd.DataFrame(
            columns=["source", "seg", "time", "n_tok", "is_original"]
        ).astype({"seg": np.int64, "time": np.int64, "n_tok": np.float64})
    return pd.concat(rows, ignore_index=True)


# ---------------------------------------------------------------- rollups

def rollup(cleaned: pd.DataFrame, width_s: int, value: str = "n_tok") -> pd.DataFrame:
    """min/max/sum/count/mean of the value channel per (source, bucket)."""
    d = cleaned.copy()
    d["bucket"] = (d["time"].to_numpy(np.int64) // width_s) * width_s
    g = d.groupby(["source", "bucket"], sort=True)[value]
    out = g.agg(
        min_n_tok="min", max_n_tok="max", sum_n_tok="sum", count_n_tok="count"
    ).reset_index()
    out = out.astype(
        {
            "bucket": np.int64,
            "min_n_tok": np.int64,
            "max_n_tok": np.int64,
            "sum_n_tok": np.int64,
            "count_n_tok": np.int64,
        }
    )
    out["mean_n_tok"] = out["sum_n_tok"] / out["count_n_tok"]
    return out


def rollup_from_rollup(prev: pd.DataFrame, width_s: int) -> pd.DataFrame:
    """Continuous-aggregate reaggregation: min of mins, max of maxes, sums."""
    d = prev.copy()
    d["bucket"] = (d["bucket"].to_numpy(np.int64) // width_s) * width_s
    g = d.groupby(["source", "bucket"], sort=True)
    out = g.agg(
        min_n_tok=("min_n_tok", "min"),
        max_n_tok=("max_n_tok", "max"),
        sum_n_tok=("sum_n_tok", "sum"),
        count_n_tok=("count_n_tok", "sum"),
    ).reset_index()
    out["mean_n_tok"] = out["sum_n_tok"] / out["count_n_tok"]
    return out


# ---------------------------------------------------------------- mode

def mode_per_key(df: pd.DataFrame, key: str, col: str) -> pd.DataFrame:
    """Most frequent value of ``col`` per ``key``; ties -> smallest value.

    Deterministic version of the reference's Counter(...).most_common(1)
    (dbconn.py:175), whose tie-break is insertion order — we pin ties to the
    minimum value so distributed and SQL implementations can agree.
    """
    # dropna=False on the KEY only: the engine's modeagg keeps a null-key
    # group (Arrow group_by) while filtering null VALUES — mirror both
    cnt = (df[df[col].notna()]
           .groupby([key, col], sort=True, dropna=False)
           .size().reset_index(name="n"))
    cnt = cnt.sort_values([key, "n", col], ascending=[True, False, True], kind="stable")
    out = cnt.groupby(key, sort=True, dropna=False).head(1)[[key, col, "n"]]
    return out.rename(columns={col: "mode_value", "n": "mode_count"}).reset_index(
        drop=True
    )
