"""CSV ingest source for the token table — the Spire/NOAA CSV reader
semantics (SURVEY.md §2.1 S2/S3/S4) re-expressed Ray-Data-first.

The reference parses wide CSV exports with fixed column extraction, epoch
derivation and skip-don't-crash handling of malformed rows
(/root/reference/aisdb_lib/src/csvreader.rs:36-332 Spire, :333-628 NOAA),
and pre-extracts compressed archives before decode
(/root/reference/aisdb/database/decoder.py:119-153).  Here:

- ``ray.data.read_csv`` supplies parallel file reads and native ``.gz``
  decompression (the S4 analog — no unzip staging step needed);
- malformed lines (wrong column count) are SKIPPED at the parser via
  ``invalid_row_handler`` — the decode-survival contract
  (/root/reference/aisdb_lib/src/decode.rs:446-485);
- the ``tokens`` column arrives as a space-joined string and is converted
  to ``list<int32>`` with vectorized pyarrow kernels; rows whose token
  string is non-numeric are dropped (skip, don't crash);
- everything downstream (epoch derivation from ``doc_id``, validity
  filtering, dedup, segmentation) is the SAME pipeline the parquet path
  uses — ``csv_ingest`` must produce output identical to ``ts_clean``.
"""

from __future__ import annotations

import gzip
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.csv as pacsv

TOKEN_COLS = ["doc_id", "tokens", "n_tok", "source"]
# shape check only (optional sign + up to 10 digits so all of int32 is
# REPRESENTABLE — a 9-digit cap silently dropped valid ids in
# [1e9, 2^31-1], and an unsigned-only pattern dropped negative tokens
# that the JSONL/IPC/parquet paths keep); the exact int32 range check
# runs after the int64 parse, same contract as the JSONL reader
_TOKENS_RE = r"^-?[0-9]{1,10}( -?[0-9]{1,10})*$"
_I32_MIN, _I32_MAX = -(1 << 31), (1 << 31) - 1


def _invalid_row_handler(row):
    return "skip"


def read_token_csv(paths):
    """Parallel CSV read of the token-table shape -> Arrow-typed Dataset.

    Accepts a file, directory, or list (plain ``.csv`` and ``.csv.gz`` mix
    freely).  Returns columns (doc_id, tokens list<int32>, n_tok int32,
    source) — the INPUT_SCHEMA contract, ready for ``prepare.prepare``.
    """
    import ray.data as rd

    ds = rd.read_csv(
        paths,
        parse_options=pacsv.ParseOptions(invalid_row_handler=_invalid_row_handler),
        convert_options=pacsv.ConvertOptions(
            column_types={
                "doc_id": pa.string(),
                "tokens": pa.string(),
                "n_tok": pa.string(),  # string first: bad ints survive to the mask
                "source": pa.string(),
            }
        ),
        file_extensions=["csv", "gz"],
    )
    return ds.map_batches(_convert_batch, batch_format="pyarrow")


def _convert_batch(b: pa.Table) -> pa.Table:
    """Vectorized string -> typed conversion with skip-bad-rows semantics."""
    toks = pc.fill_null(b["tokens"], "")
    ntok_s = pc.fill_null(b["n_tok"], "")
    ok = pc.and_(
        pc.or_(pc.match_substring_regex(toks, _TOKENS_RE), pc.equal(toks, "")),
        pc.match_substring_regex(ntok_s, r"^-?[0-9]{1,10}$"),
    )
    ok = pc.and_(ok, pc.is_valid(b["doc_id"]))
    ok = pc.and_(ok, pc.is_valid(b["source"]))
    t = b.filter(pc.fill_null(ok, False))
    toks = pc.fill_null(t["tokens"], "")
    # "" splits to [""] whose cast to int32 throws — null empties pre-split,
    # then repair the nulls to zero-length lists post-cast.
    empty = pc.equal(toks, "")
    safe = pc.if_else(empty, pa.scalar(None, pa.string()), toks)
    tokens64 = pc.cast(pc.split_pattern(safe, " "), pa.list_(pa.int64()))
    if pc.any(empty).as_py():
        empty_list = pa.array([[]] * t.num_rows, pa.list_(pa.int64()))
        tokens64 = pc.if_else(empty, empty_list, tokens64)
    # exact int32 range gate (10-digit strings can exceed 2^31-1)
    flat = pc.list_flatten(tokens64)
    bad = pc.or_(pc.less(flat, _I32_MIN), pc.greater(flat, _I32_MAX))
    keep = np.ones(t.num_rows, dtype=bool)
    bad_parent = pc.list_parent_indices(tokens64).filter(bad)
    keep[bad_parent.to_numpy(zero_copy_only=False)] = False
    nt64 = pc.cast(t["n_tok"], pa.int64())
    keep &= pc.and_(
        pc.greater_equal(nt64, _I32_MIN), pc.less_equal(nt64, _I32_MAX)
    ).to_numpy(zero_copy_only=False)
    km = pa.array(keep)
    return pa.table(
        {
            "doc_id": t["doc_id"].filter(km),
            "tokens": pc.cast(tokens64.filter(km), pa.list_(pa.int32())),
            "n_tok": pc.cast(nt64.filter(km), pa.int32()),
            "source": t["source"].filter(km),
        }
    )


def write_token_csv(
    parquet_dir: str,
    out_dir: str,
    corrupt_every: int = 0,
    gzip_last: bool = True,
    rows_per_file: int = 25_000,
) -> str:
    """Convert a parquet token dataset to CSV files (test/fixture path).

    ``corrupt_every=N`` injects a malformed line every N rows (wrong column
    counts, garbage ints) — the corrupt-input corpus the parser must
    survive (decode.rs:446-485).  ``gzip_last`` compresses the final file
    to exercise the native-``.gz`` S4 path.  Idempotent via _SUCCESS.
    """
    import pyarrow.parquet as pq

    from aisdb_ray.state.lineage import list_parquet_files

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    chunks = []
    for f in list_parquet_files(parquet_dir):
        t = pq.read_table(f, columns=TOKEN_COLS)
        for lo in range(0, t.num_rows, rows_per_file):
            chunks.append(t.slice(lo, rows_per_file))

    def _csv_field(col):
        """Quote a string column for CSV iff any value needs it (comma,
        quote, CR/LF would shift columns and silently skip the row on
        read — the JSONL writer guards its analogous hazard).  Nulls
        serialize as EMPTY fields (CSV has no null): the old path flagged
        a null as risky but replace_substring/if_else propagated the null
        into a None line that crashed the join."""
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        col = pc.fill_null(col, "")
        risky = pc.match_substring_regex(col, r'[",\r\n]')
        if not pc.any(risky).as_py():
            return col
        quoted = pc.binary_join_element_wise(
            '"', pc.replace_substring(col, pattern='"', replacement='""'),
            '"', "",
        )
        return pc.if_else(risky, quoted, col)

    for fi, t in enumerate(chunks):
        # all the per-token stringification runs in Arrow C kernels — the
        # naive per-row f-string loop was ~100 s per sf0.01 rebuild
        toks = t["tokens"].combine_chunks()
        joined = pc.fill_null(  # null token list -> empty field
            pc.binary_join(pc.cast(toks, pa.list_(pa.string())), " "), ""
        )
        base = pc.binary_join_element_wise(
            _csv_field(t["doc_id"]),
            joined,
            # null n_tok -> empty field; the reader's skip-bad gate then
            # drops the row (no integer parses from "")
            pc.fill_null(pc.cast(t["n_tok"], pa.string()).combine_chunks(), ""),
            _csv_field(t["source"]),
            ",",
        ).to_pylist()
        lines = ["doc_id,tokens,n_tok,source"]
        if not corrupt_every:
            lines.extend(base)
        else:
            prev = 0
            for i in range(corrupt_every - 1, t.num_rows, corrupt_every):
                lines.extend(base[prev:i + 1])
                prev = i + 1
                kind = i % 3
                if kind == 0:
                    lines.append("this,line,has,too,many,columns,entirely")
                elif kind == 1:
                    lines.append(
                        f"{t['doc_id'][i].as_py()}-bad,{joined[i].as_py()},"
                        f"NOT_AN_INT,{t['source'][i].as_py()}"
                    )
                else:
                    lines.append(
                        f"{t['doc_id'][i].as_py()}-bad,one two NaN,"
                        f"{t['n_tok'][i].as_py()},{t['source'][i].as_py()}"
                    )
            lines.extend(base[prev:])
        body = ("\n".join(lines) + "\n").encode()
        is_last = fi == len(chunks) - 1
        if gzip_last and is_last:
            with gzip.open(os.path.join(out_dir, f"part-{fi:05d}.csv.gz"), "wb") as fh:
                fh.write(body)
        else:
            with open(os.path.join(out_dir, f"part-{fi:05d}.csv"), "wb") as fh:
                fh.write(body)
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return out_dir
