"""Zone/domain containment with prune + fallback (J6).

The reference assigns each point to a labeled zone via a two-pass rule
(/root/reference/aisdb/gis.py:490-541): a cheap prune (distance to each
zone centroid minus the zone's max radius — candidates sorted
nearest-first), an exact containment test on the survivors, and a default
bucket ``"Z0"`` when nothing contains the point; ``fence_tracks`` then
rides the label along the track (/root/reference/aisdb/track_gen.py:266-284).

Here zones are labeled ellipses over two value channels (the engine's
non-geographic domain).  The same three-phase rule, fully vectorized:

1. prune: bounding-box test ``|x-cx|<=rx AND |y-cy|<=ry`` — O(1) per
   (zone, point) compares, no division;
2. exact: normalized squared distance ``((x-cx)/rx)^2 + ((y-cy)/ry)^2
   <= 1`` on the pruned candidates only;
3. resolve: nearest center wins (smallest distance, ties to the
   lexicographically-first name — the reference's sorted-dict iteration),
   else ``Z0``.

The stage is an actor pool holding the broadcast domain (zones are the
small side: ``ray.put`` once, read in every task — never re-shipped per
batch), matching the stateful-join pattern of SURVEY.md §2.4.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_ZONE = "Z0"


class Domain:
    """A named set of elliptical zones over channels (x_col, y_col).

    ``zones``: iterable of (name, cx, cy, rx, ry).  Stored sorted by name
    so the strict ``<`` distance comparison resolves ties to the first
    name, exactly like the reference's nearest-first iteration.
    """

    def __init__(self, zones):
        zs = sorted(zones, key=lambda z: z[0])
        self.names = [z[0] for z in zs]
        self.cx = np.array([z[1] for z in zs], dtype=np.float64)
        self.cy = np.array([z[2] for z in zs], dtype=np.float64)
        self.rx = np.array([z[3] for z in zs], dtype=np.float64)
        self.ry = np.array([z[4] for z in zs], dtype=np.float64)
        if len(zs) and not (np.all(self.rx > 0) and np.all(self.ry > 0)):
            # a zero radius makes the ellipse test 0/0 = NaN, and a NaN
            # radius fails every comparison — either way the zone can
            # never match and even its own center silently resolves to
            # Z0.  (~(r > 0) catches NaN; min(r) <= 0 does not.)
            raise ValueError("Domain: zone radii must be positive")

    def assign(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """Vectorized point->zone-name assignment (object ndarray)."""
        n = len(x)
        x = x.astype(np.float64)
        y = y.astype(np.float64)
        best_d = np.full(n, np.inf)
        best = np.full(n, DEFAULT_ZONE, dtype=object)
        for i, name in enumerate(self.names):
            # phase 1 — prune: cheap bbox candidate filter (gis.py:528-536)
            cand = (np.abs(x - self.cx[i]) <= self.rx[i]) & (
                np.abs(y - self.cy[i]) <= self.ry[i]
            )
            if not cand.any():
                continue
            # phase 2 — exact containment on survivors (gis.py:537-540)
            dx = (x[cand] - self.cx[i]) / self.rx[i]
            dy = (y[cand] - self.cy[i]) / self.ry[i]
            d = dx * dx + dy * dy
            inside = d <= 1.0
            # phase 3 — nearest-centroid resolution; strict < + ascending
            # name order == ties to lexicographically-first name
            sel = inside & (d < best_d[cand])
            take = np.flatnonzero(cand)[sel]
            if take.size:
                best_d[take] = d[sel]
                best[take] = name
        return best


class ZoneAssign:
    """Actor-pool stage: domain deserialized once per actor in __init__."""

    def __init__(self, domain_ref, x_col: str, y_col: str, out_col: str = "zone"):
        import ray

        dom = ray.get(domain_ref) if not isinstance(domain_ref, Domain) else domain_ref
        self.domain = dom
        self.x_col, self.y_col, self.out_col = x_col, y_col, out_col

    def __call__(self, b: pa.Table) -> pa.Table:
        x = b[self.x_col].to_numpy(zero_copy_only=False)
        y = b[self.y_col].to_numpy(zero_copy_only=False)
        z = self.domain.assign(x, y)
        return b.append_column(self.out_col, pa.array(z, type=pa.string()))


def assign_zones(
    ds,
    domain: Domain,
    x_col: str,
    y_col: str,
    out_col: str = "zone",
    concurrency: int = 4,
):
    """Broadcast the domain once; assign per batch in an actor pool."""
    import ray

    ref = ray.put(domain)
    return ds.map_batches(
        ZoneAssign,
        fn_constructor_args=(ref, x_col, y_col, out_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def zones_sql_values(domain: Domain) -> str:
    """The domain as a SQL VALUES list (name, cx, cy, rx, ry) — lets the
    DuckDB oracle evaluate the identical containment arithmetic."""
    rows = ", ".join(
        f"('{n}', {float(cx)!r}, {float(cy)!r}, {float(rx)!r}, {float(ry)!r})"
        for n, cx, cy, rx, ry in zip(
            domain.names, domain.cx, domain.cy, domain.rx, domain.ry
        )
    )
    return f"(VALUES {rows}) AS z(zname, cx, cy, rx, ry)"
