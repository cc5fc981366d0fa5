"""Canonical column names / Arrow schemas for the token time-series engine.

The input table shape is fixed by the graft contract (BASELINE.json
``input_hint``): ``(doc_id: string, tokens: list<int32>, n_tok: int32,
source: string)``.  The engine derives an epoch-seconds ``time`` column and a
same-second ``seq`` disambiguator from ``doc_id`` — mirroring how the
reference derives the epoch from raw payload headers
(/root/reference/aisdb_lib/src/decode.rs:60-114) rather than trusting a
stored column.
"""

from __future__ import annotations

import pyarrow as pa

# --- input columns (input_hint shape) ---
DOC_ID = "doc_id"
TOKENS = "tokens"
N_TOK = "n_tok"
SOURCE = "source"

# --- derived columns ---
TIME = "time"        # int64 epoch seconds, derived from doc_id
SEQ = "seq"          # int32 same-second disambiguator, derived from doc_id
SEG = "seg"          # int64 segment id within a source (gap segmentation)
IS_ORIGINAL = "is_original"  # bool: row existed in the input (vs gap-filled)

INPUT_SCHEMA = pa.schema(
    [
        (DOC_ID, pa.string()),
        (TOKENS, pa.list_(pa.int32())),
        (N_TOK, pa.int32()),
        (SOURCE, pa.string()),
    ]
)

# series schema after epoch derivation + validation
SERIES_FIELDS = [
    (DOC_ID, pa.string()),
    (TOKENS, pa.list_(pa.int32())),
    (N_TOK, pa.int32()),
    (SOURCE, pa.string()),
    (TIME, pa.int64()),
    (SEQ, pa.int32()),
]
SERIES_SCHEMA = pa.schema(SERIES_FIELDS)

# --- rollup tiers (TimescaleDB-style continuous-aggregate cascade) ---
BUCKET = "bucket"    # int64 epoch seconds, floored to the tier width
MIN_V = "min_n_tok"
MAX_V = "max_n_tok"
SUM_V = "sum_n_tok"
CNT_V = "count_n_tok"
MEAN_V = "mean_n_tok"

OPEN_V = "open_n_tok"   # value at the earliest (time, seq) in the bucket
CLOSE_V = "close_n_tok"  # value at the latest (time, seq) in the bucket

# tier name -> bucket width in seconds; raw -> 1m -> 1h -> 1d cascade
TIERS: dict[str, int] = {"1m": 60, "1h": 3600, "1d": 86400}
TIER_ORDER: list[str] = ["1m", "1h", "1d"]

ROLLUP_SCHEMA = pa.schema(
    [
        (SOURCE, pa.string()),
        (BUCKET, pa.int64()),
        (MIN_V, pa.int64()),
        (MAX_V, pa.int64()),
        (SUM_V, pa.int64()),
        (CNT_V, pa.int64()),
        (MEAN_V, pa.float64()),
    ]
)


# (bucket flooring lives in stages/rollup._bucket — the one definition;
# a duplicate here had zero callers and invited truncate-vs-floor drift)
