"""Value normalizer (M5) + string sanitizer (M6), vectorized.

- :func:`wrap_value` is the ``shiftcoord`` contract
  (/root/reference/aisdb/gis.py:18-35): wrap an out-of-range value into
  ``[-rng, rng]`` with a linear shift + modulus, and flip the sign of
  values sitting exactly ON the boundary (±rng → ∓rng).  Generalized to
  period ``2*rng`` so any ring-valued channel works.
- :func:`sanitize_strings` is the CSV string sanitizer
  (/root/reference/aisdb/proc_util.py:14-31): nulls and the ``"-"``
  placeholder become empty strings; commas (both ASCII 44 and the 0x82
  look-alike), ``#``, quotes and newlines are stripped so one row can
  never break the CSV framing.  Vectorized pyarrow, no Python row loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# chr(130) is the second "comma" the reference calls out explicitly
_STRIP = r"""[,#"'\n]|""" + chr(130)


def wrap_value(x, rng: float = 180.0) -> np.ndarray:
    """Wrap values into [-rng, rng]; exact-boundary values flip sign."""
    x = np.asarray(x, dtype=np.float64).copy()
    if x.size == 0:  # streaming batches are routinely empty after filters
        return x
    # nulls arrive as NaN through to_numpy — pass them through untouched
    # (they fail every comparison, so the old invariant assert crashed the
    # whole batch on one null row; under -O it silently emitted NaN)
    finite = np.isfinite(x)
    on_edge = finite & (np.abs(x) == rng)
    inner = finite & ~on_edge
    x[inner] = ((x[inner] + rng) % (2 * rng)) - rng
    x[on_edge] *= -1
    assert np.all((x[finite] >= -rng) & (x[finite] <= rng))
    return x


def wrap_column(batch: pa.Table, col: str, rng: float = 180.0) -> pa.Table:
    """map_batches body: normalize one channel in place."""
    vals = wrap_value(batch[col].to_numpy(zero_copy_only=False), rng)
    return batch.set_column(
        batch.schema.get_field_index(col), col,
        # from_pandas: NaN lanes (original nulls, and NaN inputs) come
        # back as nulls rather than leaking NaN into the channel
        pa.array(vals, from_pandas=True),
    )


def sanitize_array(arr: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    """One string column -> CSV-safe strings (proc_util._sanitize rules)."""
    s = pc.fill_null(arr, "")
    s = pc.if_else(pc.equal(s, "-"), pa.scalar(""), s)
    return pc.replace_substring_regex(s, _STRIP, "")


def sanitize_strings(batch: pa.Table, columns=None) -> pa.Table:
    """map_batches body: sanitize every (or the named) string column."""
    for i, f in enumerate(batch.schema):
        # large_string too: the data-prep path produces it for wide
        # columns, and is_string alone silently bypassed the sanitizer
        if (columns is None or f.name in columns) and (
                pa.types.is_string(f.type)
                or pa.types.is_large_string(f.type)):
            batch = batch.set_column(i, f.name, sanitize_array(batch[f.name]))
    return batch
