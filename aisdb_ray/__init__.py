"""aisdb_ray — a Ray-Data-native time-series rollup/downsample/retention engine.

Brand-new engine with the query/data-processing capabilities of AISViz/AISdb
(reference at /root/reference, studied in SURVEY.md), re-expressed as
``ray.data.Dataset`` pipelines: ``map_batches`` over zero-copy Arrow batches,
actor pools for stateful stages, explicit groupby/aggregate shuffles, and
per-partition lineage for resumable runs.

Input contract (BASELINE.json input_hint): Parquet tables of pre-tokenized
training sequences ``(doc_id: string, tokens: list<int32>, n_tok: int32,
source: string)``; ``source`` plays the role of AISdb's ``mmsi`` series key
and ``n_tok`` the measured value channel (AISdb's ``sog``).

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the caller (driver, tests, bench.py).
"""

from aisdb_ray import _env  # noqa: F401  (sandbox shims; must import first)
from aisdb_ray import schema  # noqa: F401

__version__ = "0.1.0"
