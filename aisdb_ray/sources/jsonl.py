"""JSONL ingest source for the token table — the second lake text format
next to sources/csv.py, with the same decode-survival contract
(/root/reference/aisdb_lib/src/decode.rs:446-485: corrupt lines are
SKIPPED, never crash the ingest; file-parallel reads mirror the
reference's per-file decode pool, /root/reference/src/lib.rs:155-187).

Parse strategy (skip-don't-crash without a per-row Python hot path):

- ``ray.data.read_text`` supplies parallel file reads (+ gzip via
  ``arrow_open_stream_args={"compression": "detect"}`` — the S4 analog);
- each text batch is joined and parsed in one vectorized
  ``pyarrow.json.read_json`` call with an explicit schema — a clean batch
  costs exactly one C parse;
- when the C parser rejects the batch (malformed JSON or wrong field
  types somewhere inside), lines are CLASSIFIED with ``json.loads`` +
  strict type checks (the quarantine pass — pays one Python parse only
  for batches that actually contain garbage), and the surviving subset is
  re-parsed in one C call so the Arrow arrays are still built vectorized;
- if the classifier and the C parser ever disagree (classifier-accepted
  line that C rejects), a bisecting re-parse isolates and drops it — the
  same-parser-decides backstop;
- post-parse, the same bounds masks as the CSV reader (token ids and
  n_tok must fit int32) drop out-of-range rows vectorized.

Output columns (doc_id, tokens list<int32>, n_tok int32, source) — the
INPUT_SCHEMA contract, ready for ``prepare.prepare``; the ``jsonl_ingest``
query must hash-match the parquet path's ``ts_clean`` oracle exactly.
"""

from __future__ import annotations

import gzip
import io
import json
import os

import pyarrow as pa
import pyarrow.compute as pc

_JSON_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int64())),
        ("n_tok", pa.int64()),
        ("source", pa.string()),
    ]
)
_I32_MIN, _I32_MAX = -(2**31), 2**31 - 1


def _c_parse(lines: list[str]) -> pa.Table:
    import pyarrow.json as pajson

    return pajson.read_json(
        io.BytesIO(("\n".join(lines)).encode()),
        parse_options=pajson.ParseOptions(
            explicit_schema=_JSON_SCHEMA,
            unexpected_field_behavior="ignore",
        ),
    )


def _bisect_parse(lines: list[str]) -> list[pa.Table]:
    """Last-resort quarantine when classifier and C parser disagree:
    isolate the offending line in O(log n) re-parses and drop it."""
    if not lines:
        return []
    try:
        return [_c_parse(lines)]
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        if len(lines) == 1:
            return []  # the corrupt line: skip, don't crash
        mid = len(lines) // 2
        return _bisect_parse(lines[:mid]) + _bisect_parse(lines[mid:])


def _line_ok(ln: str) -> bool:
    """Strict acceptance mirror of the explicit-schema C parse."""
    try:
        r = json.loads(ln)
    except ValueError:
        return False
    if not isinstance(r, dict):
        return False
    n_tok, toks = r.get("n_tok"), r.get("tokens")
    # `type(x) is int` is both stricter (rejects bool) and ~2x faster than
    # an isinstance chain — this loop runs once per token of corrupt-ish
    # batches, the one per-element check in the reader
    if n_tok is not None and type(n_tok) is not int:
        return False
    if toks is not None and (
        type(toks) is not list or not all(type(x) is int for x in toks)
    ):
        return False
    for key in ("doc_id", "source"):
        v = r.get(key)
        if v is not None and type(v) is not str:
            return False
    return True


def _parse_lines(lines: list[str]) -> pa.Table:
    if not lines:
        return _JSON_SCHEMA.empty_table()
    try:
        return _c_parse(lines)  # clean batch: exactly one C parse
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        pass
    good = [ln for ln in lines if _line_ok(ln)]
    try:
        return _c_parse(good) if good else _JSON_SCHEMA.empty_table()
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        parts = _bisect_parse(good)
        return pa.concat_tables(parts) if parts else _JSON_SCHEMA.empty_table()


def _parse_batch(b: pa.Table) -> pa.Table:
    # drop blank lines vectorized (a blank line is not a JSON document)
    txt = b["text"]
    nonblank = pc.not_equal(pc.utf8_trim_whitespace(txt), "")
    t = _parse_lines(txt.filter(nonblank).to_pylist())
    # the C parser coerces missing fields to null instead of erroring
    if t.num_rows:
        ok = pc.is_valid(t["doc_id"])
        for c in ("tokens", "n_tok", "source"):
            ok = pc.and_(ok, pc.is_valid(t[c]))
        t = t.filter(ok)
    if t.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.string()),
                "tokens": pa.array([], pa.list_(pa.int32())),
                "n_tok": pa.array([], pa.int32()),
                "source": pa.array([], pa.string()),
            }
        )
    # rows whose list carries null ELEMENTS are corrupt — the classifier
    # path (_line_ok) rejects them, so the clean fast path must too, or
    # acceptance would depend on which batch a corrupt neighbor landed in
    import numpy as np

    flat0 = pc.list_flatten(t["tokens"])
    if flat0.null_count:
        parn = pc.list_parent_indices(t["tokens"]).filter(pc.is_null(flat0))
        kn = np.ones(t.num_rows, dtype=bool)
        kn[parn.to_numpy(zero_copy_only=False)] = False
        t = t.filter(pa.array(kn))
    # int32 bounds masks, vectorized (same contract as the CSV reader)
    flat = pc.list_flatten(t["tokens"])
    bad_tok = pc.or_(pc.less(flat, _I32_MIN), pc.greater(flat, _I32_MAX))
    bad_parent = pc.list_parent_indices(t["tokens"]).filter(bad_tok)
    keep = np.ones(t.num_rows, dtype=bool)
    keep[bad_parent.to_numpy(zero_copy_only=False)] = False
    nt = t["n_tok"]
    in_range = pc.and_(
        pc.greater_equal(nt, _I32_MIN), pc.less_equal(nt, _I32_MAX)
    )
    keep &= in_range.to_numpy(zero_copy_only=False)
    t = t.filter(pa.array(keep))
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "tokens": pc.cast(t["tokens"], pa.list_(pa.int32())),
            "n_tok": pc.cast(t["n_tok"], pa.int32()),
            "source": t["source"],
        }
    )


def read_token_jsonl(paths):
    """Parallel JSONL read of the token-table shape -> Arrow-typed Dataset.

    Accepts a file, directory, or list; plain ``.jsonl`` and ``.jsonl.gz``
    mix freely (compression sniffed by extension).  A ``.gz`` file that is
    NOT ``.jsonl.gz`` (e.g. a stray ``.csv.gz``) is rejected up front — it
    would otherwise be ingested and silently quarantined line-by-line as
    "corrupt" instead of surfacing as a wrong-format input.
    """
    import os

    import ray.data as rd

    if isinstance(paths, (str, os.PathLike)):
        path_list = [str(paths)]
    else:
        path_list = [str(p) for p in paths]
    expanded = []
    for p in path_list:
        if os.path.isdir(p):
            expanded.extend(os.path.join(p, f) for f in sorted(os.listdir(p)))
        else:
            expanded.append(p)
    bad = [
        p for p in expanded
        if p.endswith(".gz") and not p.endswith(".jsonl.gz")
    ]
    if bad:
        raise ValueError(
            f"read_token_jsonl: .gz inputs must end in .jsonl.gz, got: {bad[:5]}"
        )
    files = [
        p for p in expanded
        if p.endswith(".jsonl") or p.endswith(".jsonl.gz")
    ]
    # wrong-format inputs SURFACE (docstring contract): reading arbitrary
    # files as JSONL would quarantine every line into a silently empty
    # dataset.  Directory markers (_SUCCESS etc.) are ignored; any other
    # non-.jsonl entry is an error.
    stray = [
        p for p in expanded
        if p not in set(files)
        and os.path.isfile(p)
        and not os.path.basename(p).startswith("_")
    ]
    if stray:
        raise ValueError(
            f"read_token_jsonl: non-JSONL inputs: {stray[:5]}"
        )
    if not files:
        raise ValueError(
            f"read_token_jsonl: no .jsonl/.jsonl.gz files in {path_list!r}"
        )
    ds = rd.read_text(
        files,
        arrow_open_stream_args={"compression": "detect"},
    )
    return ds.map_batches(_parse_batch, batch_format="pyarrow")


def write_token_jsonl(
    parquet_dir: str,
    out_dir: str,
    corrupt_every: int = 0,
    gzip_last: bool = True,
    rows_per_file: int = 6_000,
) -> str:
    # rows_per_file is deliberately smaller than the CSV writer's: JSONL
    # rows carry the token list as text (~10x the parquet bytes) and a .gz
    # member is an unsplittable stream, so smaller files = read parallelism
    """Convert a parquet token dataset to JSONL files (test/fixture path).

    ``corrupt_every=N`` injects a malformed line every N rows (broken JSON
    syntax, wrong field types, non-int token elements) — the corrupt-input
    corpus the parser must survive.  ``gzip_last`` compresses the final
    file to exercise the compression-sniffing path.  Idempotent via
    _SUCCESS.
    """
    import pyarrow.parquet as pq

    from aisdb_ray.state.lineage import list_parquet_files

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    chunks = []
    for f in list_parquet_files(parquet_dir):
        t = pq.read_table(f, columns=["doc_id", "tokens", "n_tok", "source"])
        for lo in range(0, t.num_rows, rows_per_file):
            chunks.append(t.slice(lo, rows_per_file))

    import pyarrow.compute as pc

    for fi, t in enumerate(chunks):
        # JSON lines assembled by Arrow C kernels (the per-row json.dumps
        # loop was the dominant fixture-rebuild cost).  Safe because the
        # serialized strings are verified free of characters that would
        # need JSON escaping — any offending row falls back to json.dumps.
        doc_c = t["doc_id"].combine_chunks()
        src_c = t["source"].combine_chunks()
        probe = pc.match_substring_regex(
            pc.binary_join_element_wise(doc_c, src_c, ""),
            r'["\\\x00-\x1f]',
        )
        # null doc_id/source: join yields null, pc.any ignores nulls and
        # the fast path would emit a null line (TypeError at the final
        # join) — route null rows through json.dumps instead.  The same
        # hazard applies to a null tokens LIST or null n_tok (their own
        # binary_join/cast would null the assembled line), so probe every
        # column the fast path serializes, not just the string pair.
        needs_esc = bool(pc.any(pc.fill_null(probe, True)).as_py())
        needs_esc = (needs_esc
                     or t["tokens"].null_count > 0
                     or t["n_tok"].null_count > 0)
        if needs_esc:
            base = [
                json.dumps(
                    {"doc_id": d, "tokens": tk, "n_tok": n, "source": s},
                    separators=(",", ":"),
                )
                for d, tk, n, s in zip(
                    doc_c.to_pylist(), t["tokens"].to_pylist(),
                    t["n_tok"].to_pylist(), src_c.to_pylist(),
                )
            ]
        else:
            tok_join = pc.binary_join(
                pc.cast(t["tokens"].combine_chunks(), pa.list_(pa.string())),
                ",",
            )
            base = pc.binary_join_element_wise(
                '{"doc_id":"', doc_c, '","tokens":[', tok_join,
                '],"n_tok":', pc.cast(t["n_tok"], pa.string()).combine_chunks(),
                ',"source":"', src_c, '"}', "",
            ).to_pylist()
        if not corrupt_every:
            lines = base
        else:
            doc = doc_c.to_pylist()
            ntk = t["n_tok"].to_pylist()
            src = src_c.to_pylist()
            lines = []
            prev = 0
            for i in range(corrupt_every - 1, t.num_rows, corrupt_every):
                lines.extend(base[prev:i + 1])
                prev = i + 1
                kind = i % 3
                if kind == 0:
                    lines.append('{"doc_id": "broken json, no close')
                elif kind == 1:
                    lines.append(
                        json.dumps({"doc_id": doc[i] + "-bad",
                                    "tokens": t["tokens"][i].as_py(),
                                    "n_tok": "NOT_AN_INT",
                                    "source": src[i]})
                    )
                else:
                    lines.append(
                        json.dumps({"doc_id": doc[i] + "-bad",
                                    "tokens": [1, "NaN", 3],
                                    "n_tok": ntk[i],
                                    "source": src[i]})
                    )
            lines.extend(base[prev:])
        body = ("\n".join(lines) + "\n").encode()
        is_last = fi == len(chunks) - 1
        if gzip_last and is_last:
            path = os.path.join(out_dir, f"part-{fi:05d}.jsonl.gz")
            with gzip.open(path, "wb") as fh:
                fh.write(body)
        else:
            path = os.path.join(out_dir, f"part-{fi:05d}.jsonl")
            with open(path, "wb") as fh:
                fh.write(body)
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return out_dir
