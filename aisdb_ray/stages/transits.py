"""Per-(series, segment) transit statistics — A2's rich multi-channel form.

The reference's ``_transitinfo`` summarizes one zone visit with entry/exit
zones, first/last timestamps + calendar parts, total vs cumulative
distance, per-hop velocity min/avg/max, and minutes-spent-within-band
(/root/reference/aisdb/network_graph.py:84-210; band clock
:51-66 ``_time_in_shoredist_rng``).  Here the analog over a token series,
per (source, seg):

- ``src_zone`` / ``rcv_zone`` / ``transit_nodes`` — first/last zone label
  of the visit (network_graph.py:90-96);
- ``t_start`` / ``t_end`` / ``year`` / ``month`` / ``day`` /
  ``minutes_in_seg`` (:98-111, :195-208);
- ``total_delta`` = |v_last − v_first| vs ``cum_delta`` = Σ|Δv| — the
  straight-line vs cumulative distance pair (:113-121);
- per-hop rate (value units per second) min/avg/max (:180-193).  Rates are
  int64 fixed-point ``rate_e6 = (|Δv| · 10⁶) // Δt`` so the engine and the
  SQL oracle do identical integer arithmetic — no float-sum ordering
  hazards; hops with Δt = 0 (same-epoch rows) carry no rate;
- ``sec_in_band`` = Σ Δt over hops whose BOTH endpoint values lie in
  ``[band_lo, band_hi]`` — the shoredist band clock (:136-148).

Group-local math (state never crosses a series) → runs inside the same
``groupby(source).map_groups`` shuffle the clean stage already paid for.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from aisdb_ray.schema import N_TOK, SEG, SEQ, SOURCE, TIME

RATE_SCALE = 1_000_000


def _empty_out() -> pa.Table:
    return pa.table(
        {
            SOURCE: pa.array([], pa.string()),
            SEG: pa.array([], pa.int64()),
            "src_zone": pa.array([], pa.string()),
            "rcv_zone": pa.array([], pa.string()),
            "transit_nodes": pa.array([], pa.string()),
            "t_start": pa.array([], pa.int64()),
            "t_end": pa.array([], pa.int64()),
            "n_rows": pa.array([], pa.int64()),
            "year": pa.array([], pa.int64()),
            "month": pa.array([], pa.int64()),
            "day": pa.array([], pa.int64()),
            "minutes_in_seg": pa.array([], pa.float64()),
            "total_delta": pa.array([], pa.int64()),
            "cum_delta": pa.array([], pa.int64()),
            "n_hops": pa.array([], pa.int64()),
            "rate_min_e6": pa.array([], pa.int64()),
            "rate_max_e6": pa.array([], pa.int64()),
            "rate_avg_e6": pa.array([], pa.float64()),
            "sec_in_band": pa.array([], pa.int64()),
        }
    )


def transit_stats_group(
    group: pa.Table,
    band_lo: int,
    band_hi: int,
    *,
    zone_col: str = "zone",
    value_col: str = N_TOK,
) -> pa.Table:
    """One source's per-segment transit summary (vectorized, no row loop)."""
    t = group[TIME].to_numpy(zero_copy_only=False).astype(np.int64)
    s = group[SEQ].to_numpy(zero_copy_only=False)
    order = np.lexsort((s, t))  # defensive re-sort (interp.py:334-338)
    t = t[order]
    seg = group[SEG].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    v = group[value_col].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    zone = group[zone_col].to_numpy(zero_copy_only=False)[order]
    n = len(t)
    if n == 0:
        return _empty_out()
    src = group[SOURCE][0].as_py()

    first = np.flatnonzero(np.r_[True, seg[1:] != seg[:-1]])
    last = np.r_[first[1:] - 1, n - 1]
    nseg = len(first)

    # hop arrays (row i-1 -> i), valid only within a segment
    dt = np.diff(t)
    dv = np.abs(np.diff(v))
    same_seg = seg[1:] == seg[:-1]
    hop_seg_idx = np.cumsum(np.r_[True, seg[1:] != seg[:-1]])[:-1] - 1  # per-hop seg slot
    rated = same_seg & (dt > 0)
    rate = np.zeros(len(dt), dtype=np.int64)
    rate[rated] = (dv[rated] * RATE_SCALE) // dt[rated]

    def seg_sum(values, mask):
        out = np.zeros(nseg, dtype=np.int64)
        np.add.at(out, hop_seg_idx[mask], values[mask])
        return out

    n_hops = seg_sum(np.ones(len(dt), dtype=np.int64), rated)
    sum_rate = seg_sum(rate, rated)
    cum_delta = seg_sum(dv, same_seg)
    in_band = (
        rated
        & (v[:-1] >= band_lo) & (v[:-1] <= band_hi)
        & (v[1:] >= band_lo) & (v[1:] <= band_hi)
    )
    sec_in_band = seg_sum(dt, in_band)

    rate_min = np.full(nseg, np.iinfo(np.int64).max, dtype=np.int64)
    rate_max = np.full(nseg, np.iinfo(np.int64).min, dtype=np.int64)
    np.minimum.at(rate_min, hop_seg_idx[rated], rate[rated])
    np.maximum.at(rate_max, hop_seg_idx[rated], rate[rated])
    has_rate = n_hops > 0

    d = t[first].astype("datetime64[s]")
    years = d.astype("datetime64[Y]").astype(np.int64) + 1970
    months = d.astype("datetime64[M]").astype(np.int64) % 12 + 1
    days = (d - d.astype("datetime64[M]")).astype("timedelta64[D]").astype(np.int64) + 1

    zf = zone[first].astype(object)
    zl = zone[last].astype(object)

    def _opt(arr):
        return pa.array(
            [int(x) if ok else None for x, ok in zip(arr, has_rate)], pa.int64()
        )

    return pa.table(
        {
            SOURCE: pa.array([src] * nseg, pa.string()),
            SEG: pa.array(seg[first], type=pa.int64()),
            "src_zone": pa.array(zf, pa.string()),
            "rcv_zone": pa.array(zl, pa.string()),
            "transit_nodes": pa.array(
                [f"{a}_{b}" for a, b in zip(zf, zl)], pa.string()
            ),
            "t_start": pa.array(t[first], type=pa.int64()),
            "t_end": pa.array(t[last], type=pa.int64()),
            "n_rows": pa.array(last - first + 1, type=pa.int64()),
            "year": pa.array(years),
            "month": pa.array(months),
            "day": pa.array(days),
            "minutes_in_seg": pa.array((t[last] - t[first]) / 60.0),
            "total_delta": pa.array(np.abs(v[last] - v[first]), type=pa.int64()),
            "cum_delta": pa.array(cum_delta),
            "n_hops": pa.array(n_hops),
            "rate_min_e6": _opt(rate_min),
            "rate_max_e6": _opt(rate_max),
            "rate_avg_e6": pa.array(
                [s / c if c else None for s, c in zip(sum_rate, n_hops)],
                pa.float64(),
            ),
            "sec_in_band": pa.array(sec_in_band),
        }
    )


def transit_stats(
    ds,
    band_lo: int,
    band_hi: int,
    *,
    zone_col: str = "zone",
    value_col: str = N_TOK,
):
    """groupby(source) → per-segment transit summaries."""
    return ds.groupby(SOURCE).map_groups(
        lambda g: transit_stats_group(
            g, band_lo, band_hi, zone_col=zone_col, value_col=value_col
        ),
        batch_format="pyarrow",
    )


def transition_counts(
    ds,
    key: str = "user_id",
    label: str = "event_type",
    time_col: str = "ts_us",
    seq_col: str = "event_id",
    num_parts: int | None = None,
):
    """Global (label -> next label) transition counts over per-key ordered
    event sequences — the Sankey / user-path-mining aggregate (the event
    analog of the reference's zone-to-zone transit edges,
    /root/reference/aisdb/network_graph.py:84-96, counted corpus-wide).

    One hash co-shuffle on the sequence key (each key's full history lands
    in one partition), a vectorized lexsort + adjacent-pair count per
    partition, then a funnel combine — the result is bounded by
    |label alphabet|², small by construction.  Output: (from_label,
    to_label, n), exact integers."""
    import pyarrow.compute as pc

    from aisdb_ray.stages._dist import co_shuffle, funnel_combine

    def per_part(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "from_label": pa.array([], pa.string()),
                "to_label": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if part.num_rows < 2:
            return empty
        kcol = part[key]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        enc = pc.dictionary_encode(kcol)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        # fill_null(-1): SQL window PARTITION BY groups nulls into ONE
        # partition, and the raw NaN float -> int64 cast is undefined
        kid = pc.fill_null(enc.indices, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        t = part[time_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = part[seq_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((s, t, kid))
        same = kid[order][1:] == kid[order][:-1]
        if not same.any():
            return empty
        lab = part[label]
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        frm = lab.take(pa.array(order[:-1][same]))
        to = lab.take(pa.array(order[1:][same]))
        pairs = pa.table({"from_label": frm, "to_label": to})
        # SQL parity: the oracle's WHERE nxt IS NOT NULL drops pairs whose
        # NEXT label is null (a mid-sequence null label is
        # indistinguishable from lead()'s partition-end null); from_label
        # nulls group as NULL, exactly like SQL GROUP BY
        pairs = pairs.filter(pc.is_valid(pairs["to_label"]))
        g = pairs.group_by(
            ["from_label", "to_label"], use_threads=False
        ).aggregate([([], "count_all")])
        return g.rename_columns(["from_label", "to_label", "n"])

    parts = co_shuffle(ds, [key], per_part, num_parts=num_parts)

    def merge(b: pa.Table) -> pa.Table:
        g = b.group_by(["from_label", "to_label"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["from_label", "to_label", "n"])

    return funnel_combine(parts, merge)


def path_trigram_counts(
    ds,
    key: str = "user_id",
    label: str = "event_type",
    time_col: str = "ts_us",
    seq_col: str = "event_id",
    num_parts: int | None = None,
):
    """Global 3-step path counts (l1 → l2 → l3 over consecutive events of
    the same key) — the journey-mining extension of
    :func:`transition_counts` from edges to length-3 paths, same one
    co-shuffle + vectorized shift + |alphabet|³-bounded combine.
    Output: (l1, l2, l3, n)."""
    import pyarrow.compute as pc

    from aisdb_ray.stages._dist import co_shuffle, funnel_combine

    def per_part(part: pa.Table) -> pa.Table:
        empty = pa.table({
            "l1": pa.array([], pa.string()),
            "l2": pa.array([], pa.string()),
            "l3": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        })
        if part.num_rows < 3:
            return empty
        kcol = part[key]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        enc = pc.dictionary_encode(kcol)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        # fill_null(-1): SQL window PARTITION BY groups nulls into ONE
        # partition, and the raw NaN float -> int64 cast is undefined
        kid = pc.fill_null(enc.indices, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        t = part[time_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = part[seq_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((s, t, kid))
        k = kid[order]
        same3 = (k[2:] == k[1:-1]) & (k[1:-1] == k[:-2])
        if not same3.any():
            return empty
        lab = part[label]
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        i0 = order[:-2][same3]
        triples = pa.table({
            "l1": lab.take(pa.array(i0)),
            "l2": lab.take(pa.array(order[1:-1][same3])),
            "l3": lab.take(pa.array(order[2:][same3])),
        })
        # SQL parity: WHERE l2 IS NOT NULL AND l3 IS NOT NULL (mid-sequence
        # null labels look like lead()'s partition-end nulls to the oracle)
        triples = triples.filter(pc.and_(
            pc.is_valid(triples["l2"]), pc.is_valid(triples["l3"])
        ))
        g = triples.group_by(["l1", "l2", "l3"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["l1", "l2", "l3", "n"])

    parts = co_shuffle(ds, [key], per_part, num_parts=num_parts)

    def merge(b: pa.Table) -> pa.Table:
        g = b.group_by(["l1", "l2", "l3"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["l1", "l2", "l3", "n"])

    return funnel_combine(parts, merge)
