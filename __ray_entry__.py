"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (the raw -> series -> 1m -> 1h -> 1d
retention cascade with per-partition lineage) on the sf0.001-scale token
fixture and returns the 1d tier.  ``queries()`` / ``oracle_sql()`` expose the
operator catalog (see aisdb_ray/pipelines/queries.py) for the driver's
DuckDB-checked correctness gate at sf=0.01.

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship cascade on the sf0.001-scale token table; returns the 1d tier."""
    import ray.data as rd

    from aisdb_ray.pipelines import queries as q
    from aisdb_ray.pipelines.cascade import CascadeConfig, run_cascade

    q._ctx()
    tokens = q.ensure_sf_tokens("/root/testdata/sf0.001")
    out_root = "/tmp/aisdb_ray_entry/cascade_sf0.001"
    cfg = CascadeConfig(
        input_path=tokens,
        out_root=out_root,
        num_parts=4,
        max_gap=q.TS_MAX_GAP,
        step=q.TS_STEP,
        max_concurrent_parts=2,
    )
    run_cascade(cfg)
    files = []
    tier_dir = os.path.join(out_root, "tier_1d")
    for root, _d, fs in os.walk(tier_dir):
        files += [os.path.join(root, f) for f in fs if f.endswith(".parquet")]
    return rd.read_parquet(sorted(files))


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from aisdb_ray.pipelines import queries as q

    return q.build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each (SQL-expressible) query."""
    from aisdb_ray.pipelines import queries as q

    return q.build_oracle_sql()
