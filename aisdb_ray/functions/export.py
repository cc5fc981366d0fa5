"""Series export sinks (the write_csv / tracks_csv analog).

The reference flattens track vectors to CSV with a fixed column order,
per-column decimal rounding, and an incrementing ``Track_ID`` per segment
(/root/reference/aisdb/proc_util.py:166-333; column order :195-221, rounding
:259-265).  Here: cleaned/segmented series rows -> deterministic CSV layout,
written via Ray's parallel CSV sink (a directory of part files).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from aisdb_ray.schema import N_TOK, SEG, SEQ, SOURCE, TIME

# fixed export column order (the reference pins order explicitly)
EXPORT_COLUMNS = ["Track_ID", "source", "time", "seq", "n_tok", "mean_rate"]


def export_batch(batch: pa.Table, rate_decimals: int = 4) -> pa.Table:
    """Shape one cleaned block for export: Track_ID = '{source}#{seg}',
    derived per-point token rate rounded to ``rate_decimals``."""
    track = pc.binary_join_element_wise(
        batch[SOURCE], pc.cast(batch[SEG], pa.string()), "#"
    )
    rate = pc.round(
        pc.divide(
            pc.cast(batch[N_TOK], pa.float64()),
            pa.scalar(60.0),  # value per minute at base cadence
        ),
        ndigits=rate_decimals,
    )
    return pa.table(
        {
            "Track_ID": track,
            "source": batch[SOURCE],
            "time": pc.cast(batch[TIME], pa.int64()),
            "seq": pc.cast(batch[SEQ], pa.int32()),
            "n_tok": pc.cast(batch[N_TOK], pa.int32()),
            "mean_rate": rate,
        }
    )


def write_series_csv(ds_cleaned, out_dir: str) -> None:
    """Cleaned series -> CSV directory with the fixed export layout.

    String columns pass through the M6 sanitizer (proc_util.py:14-31) so a
    stray comma/quote/newline in a key can never break the CSV framing."""
    from aisdb_ray.functions.sanitize import sanitize_strings

    # sanitize INPUT fields before composing Track_ID (the reference
    # sanitizes each value before assembling the line, proc_util.py:285-300)
    # — sanitizing afterwards would strip the '#' separator itself
    (
        ds_cleaned.map_batches(sanitize_strings, batch_format="pyarrow")
        .map_batches(export_batch, batch_format="pyarrow")
        .write_csv(out_dir)
    )
