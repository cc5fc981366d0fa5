"""Predicate surface + pushdown (M8): file pruning, row-group pruning,
mixed post-filter, SQL parity with DuckDB on the same predicate object."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from aisdb_ray import predicates as P


@pytest.fixture(scope="module")
def hive_dir(tmp_path_factory) -> str:
    """8 hive day-partitions x 10 row groups each, sorted time inside."""
    root = str(tmp_path_factory.mktemp("hive"))
    rng = np.random.default_rng(7)
    for day in range(8):
        t = pa.table(
            {
                "time": np.arange(100_000, dtype=np.int64) + day * 100_000,
                "key": rng.integers(0, 50, 100_000),
                "v": rng.random(100_000),
            }
        )
        d = os.path.join(root, f"day={day}")
        os.makedirs(d)
        pq.write_table(t, os.path.join(d, "f.parquet"), row_group_size=10_000)
    return root


def test_sql_rendering():
    p = (P.field("a") >= 3) & (P.field("b") == "x'y") | ~(P.field("c") < 1.5)
    s = p.sql("t")
    assert "t.a >= 3" in s and "t.b = 'x''y'" in s and "NOT (t.c < 1.5)" in s
    assert P.in_keys([1, 2], "k").sql() == "k IN (1, 2)"


def test_expr_matches_sql_on_table():
    t = pa.table({"a": [1, 2, 3, 4], "b": ["x", "y", "x", "z"]})
    p = (P.field("a").between(2, 4)) & (P.field("b") != "y")
    got = pads.dataset(t).to_table(filter=p.expr())
    want = duckdb.connect().execute(
        f"SELECT * FROM t WHERE {p.sql()}"
    ).arrow()
    assert got.equals(want.cast(got.schema))


def test_file_pruning_is_metadata_only(hive_dir):
    pred = P.field("day") <= 2
    files = P.prune_files(hive_dir, pred)
    assert len(files) == 3  # 3 of 8 partitions survive — whole files pruned
    ds = P.scan_parquet(hive_dir, where=pred, partition_cols=["day"])
    assert len(ds.input_files()) == 3
    df = ds.to_pandas()
    assert len(df) == 300_000 and sorted(set(df["day"])) == [0, 1, 2]


def test_rowgroup_filter_and_mixed_post(hive_dir):
    # day (partition) prunes files; time + key push into the arrow scan
    # where row-group statistics prune before decode
    pred = (
        P.field("day").isin([1, 3])
        & P.in_timerange(150_000, 320_000)
        & (P.field("key") >= 10)
    )
    ds = P.scan_parquet(hive_dir, where=pred, partition_cols=["day"])
    assert len(ds.input_files()) == 2
    df = ds.to_pandas()
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT * FROM read_parquet('{hive_dir}/*/*.parquet',
                                       hive_partitioning=1)
            WHERE {pred.sql()}"""
    ).df()
    assert len(df) == len(want)
    assert df["time"].sum() == want["time"].sum()
    assert df["key"].sum() == want["key"].sum()


def test_mixed_conjunct_posts_correctly(hive_dir):
    # references both a partition col and a data col in ONE conjunct:
    # cannot push into the arrow scan (day is not in the file schema), so
    # it must evaluate post-read and still be exact
    mixed = (P.field("day") == 2) | (P.field("key") == 7)
    pred = P.in_timerange(0, 250_000) & mixed
    ds = P.scan_parquet(hive_dir, where=pred, partition_cols=["day"])
    df = ds.to_pandas()
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT count(*) n FROM read_parquet('{hive_dir}/*/*.parquet',
                                                hive_partitioning=1)
            WHERE {pred.sql()}"""
    ).df()
    assert len(df) == int(want["n"][0])


def test_empty_prune_returns_empty_with_schema(hive_dir):
    ds = P.scan_parquet(
        hive_dir, where=P.field("day") > 99, partition_cols=["day"]
    )
    assert ds.count() == 0


def test_reference_callback_analogs():
    # the 5 primitives compose exactly like sqlfcn_callbacks' lambdas
    import datetime as dt

    p = (
        P.in_timerange(dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1), "ts")
        & P.valid_key(100, 1000, "user_id")
        & P.has_key("click", "event_type")
    )
    s = p.sql("e")
    assert "e.ts >= TIMESTAMP '2024-01-01 00:00:00'" in s
    assert "e.user_id >= 100" in s and "e.user_id < 1000" in s
    assert "e.event_type = 'click'" in s
    with pytest.raises(AssertionError):
        P.in_box("x", 5, 1, "y", 0, 1)  # degenerate box rejected


# ---------------------------------------------------------- property test

from hypothesis import given, settings, strategies as st

_T = pa.table({
    "x": pa.array(list(range(-5, 15)) * 3, pa.int64()),
    "y": pa.array([i * 0.5 - 3 for i in range(60)], pa.float64()),
    "s": pa.array([f"k{i % 7}" for i in range(60)], pa.string()),
})

_leaf = st.one_of(
    st.tuples(st.just("x"), st.sampled_from(["==", "!=", "<", "<=", ">", ">="]),
              st.integers(-6, 16)),
    st.tuples(st.just("y"), st.sampled_from(["<", ">="]),
              st.floats(-4, 28, allow_nan=False)),
    st.tuples(st.just("s"), st.just("=="), st.sampled_from([f"k{i}" for i in range(8)])),
)


def _build(spec):
    col, op, v = spec
    f = P.field(col)
    return {"==": f.__eq__, "!=": f.__ne__, "<": f.__lt__,
            "<=": f.__le__, ">": f.__gt__, ">=": f.__ge__}[op](v)


@settings(max_examples=60, deadline=None)
@given(st.lists(_leaf, min_size=1, max_size=4), st.booleans(), st.booleans())
def test_expr_and_sql_agree_on_random_predicates(leaves, use_or, negate):
    pred = _build(leaves[0])
    for spec in leaves[1:]:
        pred = (pred | _build(spec)) if use_or else (pred & _build(spec))
    if negate:
        pred = ~pred
    got = pads.dataset(_T).to_table(filter=pred.expr())
    want = duckdb.connect().execute(
        f"SELECT * FROM _T WHERE {pred.sql()}"
    ).arrow()
    assert got.num_rows == want.num_rows
    assert sorted(got["x"].to_pylist()) == sorted(want["x"].to_pylist())
    assert sorted(got["s"].to_pylist()) == sorted(want["s"].to_pylist())


def test_mixed_post_with_projection_widens_then_reprojects(hive_dir):
    # the mixed conjunct references day+key, but the caller projects only
    # ["time"]: the scan must widen the read for the post filter and then
    # return exactly the requested columns
    pred = P.in_timerange(0, 250_000) & ((P.field("day") == 2) | (P.field("key") == 7))
    ds = P.scan_parquet(hive_dir, where=pred, partition_cols=["day"],
                        columns=["time"])
    df = ds.to_pandas()
    assert list(df.columns) == ["time"]
    want = duckdb.connect().execute(
        f"""SELECT count(*) n FROM read_parquet('{hive_dir}/*/*.parquet',
                                                hive_partitioning=1)
            WHERE {pred.sql()}"""
    ).df()
    assert len(df) == int(want["n"][0])


def test_empty_prune_respects_projection(hive_dir):
    ds = P.scan_parquet(hive_dir, where=P.field("day") > 99,
                        partition_cols=["day"], columns=["time", "key"])
    assert ds.count() == 0
    assert ds.schema().names == ["time", "key"]


def test_scan_parquet_misdeclared_partition_col_still_filters(tmp_path):
    """Declaring partition_cols that the layout does NOT partition on
    (flat directory, 'day' is a data column) must not drop the conjunct:
    pyarrow's hive discovery keeps every fragment for such filters, so the
    predicate has to be re-routed to the row filter."""
    for i in range(3):
        pq.write_table(
            pa.table({"day": np.full(4, i, np.int64), "v": np.arange(4.0)}),
            str(tmp_path / f"f{i}.parquet"),
        )
    ds = P.scan_parquet(
        str(tmp_path), where=P.field("day") <= 1, partition_cols=["day"],
    )
    df = ds.to_pandas()
    assert sorted(set(df["day"])) == [0, 1]
    assert len(df) == 8


def test_scan_parquet_empty_prune_dtype_matches_nonempty(tmp_path):
    """The empty-prune branch must return partition columns with the SAME
    dtype as a non-empty scan (int64, not hive-inferred int32)."""
    for i in range(2):
        d = tmp_path / f"day={i}"
        d.mkdir()
        pq.write_table(pa.table({"v": np.arange(3.0)}), str(d / "f.parquet"))
    full = P.scan_parquet(
        str(tmp_path), where=P.field("day") >= 0, partition_cols=["day"],
        columns=["v", "day"],
    )
    empty = P.scan_parquet(
        str(tmp_path), where=P.field("day") > 99, partition_cols=["day"],
        columns=["v", "day"],
    )
    sf = full.schema()
    se = empty.schema()
    assert dict(zip(se.names, [str(t) for t in se.types])) == \
        dict(zip(sf.names, [str(t) for t in sf.types]))
    assert empty.count() == 0 and full.count() == 6
