"""Composable predicate surface with storage-level pushdown (M8).

The reference exposes query filters as composable WHERE-fragment builders
(/root/reference/aisdb/database/sqlfcn_callbacks.py:17-56 — 11 stock
conjunction lambdas over 5 primitives in sql_query_strings.py:10-115:
in_bbox / in_timerange / has_mmsi / in_mmsi / valid_mmsi), interpolated
into the storage engine's SQL so pruning happens at the scan.  Here the
same surface is a tiny predicate AST; one :class:`Pred` compiles to

- a ``pyarrow.dataset`` expression — pushed into ``read_parquet`` where
  Arrow prunes row groups from footer statistics before any bytes move;
- hive-partition file pruning — conjuncts that touch only partition
  columns are resolved DRIVER-SIDE against the directory layout
  (metadata-only, no footer reads), so whole files never enter the plan;
- a SQL string — the DuckDB oracle runs the identical WHERE, keeping the
  engine and oracle comparable row-for-row.

At 100 TB the distinction matters: partition pruning is O(#directories)
on the driver, row-group pruning is O(#footers) spread across read tasks,
and both happen before the streaming executor sees a block.
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterable, Sequence

_OPS_SQL = {"==": "=", "!=": "<>", "<": "<", "<=": "<=", ">": ">", ">=": ">="}


def _lit_sql(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, _dt.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, (int, float)):
        return repr(v)
    raise TypeError(f"unsupported literal type for predicate: {type(v)}")


class Pred:
    """One predicate: an expression factory + a SQL renderer + its columns.

    ``&``/``|``/``~`` compose; ``conjuncts()`` exposes the top-level AND
    list so :func:`scan_parquet` can route each conjunct to the cheapest
    layer (file prune / row-group prune / post-read vectorized filter).
    """

    def __init__(self, make_expr, sql_fn, columns: Iterable[str], conjuncts=None):
        self._make_expr = make_expr
        self._sql_fn = sql_fn
        self.columns = frozenset(columns)
        self._conjuncts = conjuncts

    def expr(self):
        """The pyarrow.dataset expression (built lazily; picklable)."""
        return self._make_expr()

    def sql(self, alias: str | None = None) -> str:
        """The equivalent SQL fragment; ``alias`` prefixes column refs."""
        return self._sql_fn(f"{alias}." if alias else "")

    def conjuncts(self) -> tuple["Pred", ...]:
        return self._conjuncts if self._conjuncts is not None else (self,)

    def __and__(self, o: "Pred") -> "Pred":
        return Pred(
            lambda: self.expr() & o.expr(),
            lambda a: f"({self._sql_fn(a)}) AND ({o._sql_fn(a)})",
            self.columns | o.columns,
            self.conjuncts() + o.conjuncts(),
        )

    def __or__(self, o: "Pred") -> "Pred":
        return Pred(
            lambda: self.expr() | o.expr(),
            lambda a: f"({self._sql_fn(a)}) OR ({o._sql_fn(a)})",
            self.columns | o.columns,
        )

    def __invert__(self) -> "Pred":
        return Pred(
            lambda: ~self.expr(),
            lambda a: f"NOT ({self._sql_fn(a)})",
            self.columns,
        )


def _leaf(col: str, op: str, v) -> Pred:
    def make():
        import pyarrow.dataset as pads

        f = pads.field(col)
        return {
            "==": f.__eq__, "!=": f.__ne__, "<": f.__lt__,
            "<=": f.__le__, ">": f.__gt__, ">=": f.__ge__,
        }[op](v)

    return Pred(make, lambda a: f"{a}{col} {_OPS_SQL[op]} {_lit_sql(v)}", {col})


class Field:
    """Fluent column reference: ``field('time') >= 0`` returns a Pred."""

    def __init__(self, name: str):
        self.name = name

    def __eq__(self, v):  # type: ignore[override]
        return _leaf(self.name, "==", v)

    def __ne__(self, v):  # type: ignore[override]
        return _leaf(self.name, "!=", v)

    def __lt__(self, v):
        return _leaf(self.name, "<", v)

    def __le__(self, v):
        return _leaf(self.name, "<=", v)

    def __gt__(self, v):
        return _leaf(self.name, ">", v)

    def __ge__(self, v):
        return _leaf(self.name, ">=", v)

    def isin(self, vs: Sequence) -> Pred:
        vs = list(vs)

        def make():
            import pyarrow.dataset as pads

            return pads.field(self.name).isin(vs)

        # empty value list: Arrow's isin matches nothing, but SQL
        # "col IN ()" is a parse error — render FALSE instead
        sql_fn = (
            (lambda a: "1 = 0") if not vs
            else (lambda a:
                  f"{a}{self.name} IN ({', '.join(_lit_sql(v) for v in vs)})")
        )
        return Pred(make, sql_fn, {self.name})

    def between(self, lo, hi) -> Pred:
        """lo <= col <= hi (inclusive both ends, the reference's timerange)."""
        return (_leaf(self.name, ">=", lo)) & (_leaf(self.name, "<=", hi))


def field(name: str) -> Field:
    return Field(name)


# --- the reference's stock callbacks, re-expressed -------------------------

def in_timerange(start, end, col: str = "time") -> Pred:
    """sql_query_strings.py:56-69 — inclusive time-range conjunct."""
    return field(col).between(start, end)


def has_key(value, col: str = "source") -> Pred:
    """has_mmsi analog (sql_query_strings.py:72-84): single-key equality."""
    return field(col) == value


def in_keys(values: Sequence, col: str = "source") -> Pred:
    """in_mmsi analog (sql_query_strings.py:87-100): key-set membership."""
    return field(col).isin(values)


def valid_key(lo, hi, col: str = "source") -> Pred:
    """valid_mmsi analog (sql_query_strings.py:103-115): half-open range of
    structurally-valid identifiers ``lo <= col < hi``."""
    return (field(col) >= lo) & (field(col) < hi)


def in_box(xcol: str, xmin, xmax, ycol: str, ymin, ymax) -> Pred:
    """in_bbox analog (sql_query_strings.py:10-53): a 2-channel value box,
    with the reference's degenerate-box assertions."""
    assert xmin < xmax, f"got {xmin=} {xmax=}"
    assert ymin < ymax, f"got {ymin=} {ymax=}"
    return field(xcol).between(xmin, xmax) & field(ycol).between(ymin, ymax)


# --- pushdown scan ----------------------------------------------------------

def _and_all(preds: list[Pred]) -> Pred:
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def scan_parquet(
    path,
    where: Pred | None = None,
    columns: list[str] | None = None,
    partition_cols: Sequence[str] = (),
    **read_kwargs,
):
    """``read_parquet`` with the predicate routed to the cheapest layer.

    Conjuncts over ``partition_cols`` (hive layout) prune whole FILES on
    the driver via dataset-fragment metadata; conjuncts over data columns
    push into Arrow's scan ``filter`` (row-group statistics pruning);
    conjuncts mixing both evaluate post-read, vectorized, via an
    in-memory dataset filter — never a Python row loop.
    """
    import ray.data as rd

    if where is None:
        return rd.read_parquet(path, columns=columns, **read_kwargs)

    # A DECLARED partition col is only trustworthy when the layout really
    # partitions on it: a genuine hive partition field is parsed from the
    # directory path and absent from the files' physical schema.  On a
    # flat layout pyarrow's "hive" discovery reports the full data schema
    # as the partitioning schema and get_fragments keeps EVERY fragment
    # for filters over non-partition fields — so trusting the declaration
    # would silently drop those conjuncts and return unfiltered rows.
    # Verify against one fragment's physical schema and route misdeclared
    # cols back to the row filter.
    pset = set(partition_cols)
    dset = None
    actual: set = set()
    if pset:
        import pyarrow.dataset as pads

        dset = pads.dataset(path, partitioning="hive")
        frag0 = next(iter(dset.get_fragments()), None)
        phys = set(frag0.physical_schema.names) if frag0 is not None else set()
        actual = {c for c in pset if c not in phys}

    file_p, row_p, post_p = [], [], []
    for c in where.conjuncts():
        if actual and c.columns <= actual:
            file_p.append(c)
        elif c.columns.isdisjoint(actual):
            row_p.append(c)
        else:
            post_p.append(c)

    paths = path
    partitioning = None
    if actual:
        import pyarrow as pa
        from ray.data.datasource.partitioning import Partitioning

        types = {}
        for f in dset.partitioning.schema:
            if f.name in actual:
                ts = str(f.type)
                types[f.name] = int if "int" in ts else (
                    float if ("float" in ts or "double" in ts) else str
                )
        fexpr = _and_all(file_p).expr() if file_p else None
        paths = [f.path for f in dset.get_fragments(filter=fexpr)]
        if not paths:
            empty = dset.schema.empty_table()
            # hive inference types partition cols int32, but non-empty
            # scans materialize them via field_types (int -> int64):
            # align the empty branch so unions/schema checks don't see a
            # dtype that depends on whether pruning emptied the scan
            for name in actual:
                i = empty.schema.get_field_index(name)
                py_t = types.get(name, str)
                tgt = (pa.int64() if py_t is int
                       else pa.float64() if py_t is float else pa.string())
                empty = empty.set_column(
                    i, pa.field(name, tgt), empty[name].cast(tgt)
                )
            if columns is not None:
                empty = empty.select(columns)  # match the projected schema
            return rd.from_arrow(empty)
        partitioning = Partitioning("hive", base_dir=str(path), field_types=types)

    if partitioning is not None:
        # only override Ray's default when we pruned to explicit file paths
        # (passing partitioning=None with columns= trips a Ray bug in
        # _infer_data_and_partition_columns)
        read_kwargs = {**read_kwargs, "partitioning": partitioning}
    if row_p:
        read_kwargs = {**read_kwargs, "filter": _and_all(row_p).expr()}

    # a mixed conjunct can reference columns outside the projection: widen
    # the read to include them (partition cols parse from paths, data cols
    # from files), then re-project after the post filter
    read_columns = columns
    extra: list[str] = []
    if post_p and columns is not None:
        needed = set().union(*(c.columns for c in post_p))
        extra = sorted(needed - set(columns))
        if extra:
            read_columns = list(columns) + extra

    ds = rd.read_parquet(paths, columns=read_columns, **read_kwargs)
    if post_p:
        post_expr = _and_all(post_p).expr()
        keep = list(columns) if extra else None

        def _post(b):
            import pyarrow.dataset as pads

            out = pads.dataset(b).to_table(filter=post_expr)
            return out.select(keep) if keep else out

        ds = ds.map_batches(_post, batch_format="pyarrow")
    return ds


def prune_files(path, where: Pred) -> list[str]:
    """Driver-side metadata-only file pruning (exposed for tests/catalogs)."""
    import pyarrow.dataset as pads

    dset = pads.dataset(path, partitioning="hive")
    return [f.path for f in dset.get_fragments(filter=where.expr())]
