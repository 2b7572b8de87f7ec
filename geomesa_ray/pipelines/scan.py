"""Spatio-temporal range scan: the Ray-Data analog of a Z3-index query.

Mirrors the reference read path (``QueryPlanner.runQuery`` ->
``Z3IdxStrategy`` -> ``Z3Iterator`` -> exact filter):

1. Plan (driver-side, pure Python): split the query interval into epoch
   weeks with week-edge time bounds (``Z3IdxStrategy.scala:134-163``),
   compute covering z-ranges per distinct time-shape
   (``Z3.zranges``/``MergeQueue``), detect whole-world queries that
   filter nothing (``QueryFilterSplitter.scala:87-90``).
2. Coarse vectorized filter: z3-in-ranges via searchsorted — the role of
   the server-side ``Z3Iterator.scala:55-70`` key-decode check.
3. Exact refine: lon/lat/dtg comparisons (inclusive edges, matching SQL
   BETWEEN semantics).

The same plan object prunes partitions when scanning a cell-partitioned
``SpatialStore`` (see state/store.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

import ray.data

from geomesa_ray.curve.sfc import SECONDS_PER_WEEK, lonlat_to_xy, zranges_3d
from geomesa_ray.sources.fixtures import DTG_BASE_S, DTG_SPAN_S
from geomesa_ray.sources.io import read_images
from geomesa_ray.stages.encode import derive_and_encode

TBITS_N = 1 << 20


@dataclass(frozen=True)
class SpatialQuery:
    lon_min: float
    lon_max: float
    lat_min: float
    lat_max: float
    t_start_s: int | None = None  # unix seconds, inclusive
    t_end_s: int | None = None    # unix seconds, inclusive

    @property
    def is_whole_world(self) -> bool:
        return (self.lon_min <= -180.0 and self.lon_max >= 180.0
                and self.lat_min <= -90.0 and self.lat_max >= 90.0)


@dataclass
class QueryPlan:
    """Per-week coarse z-ranges + the exact predicate bounds."""

    query: SpatialQuery
    week_ranges: dict[int, tuple[np.ndarray, np.ndarray]] = field(default_factory=dict)
    skip_coarse: bool = False


def plan_query(query: SpatialQuery) -> QueryPlan:
    t0 = query.t_start_s if query.t_start_s is not None else DTG_BASE_S
    t1 = query.t_end_s if query.t_end_s is not None else DTG_BASE_S + DTG_SPAN_S
    if query.is_whole_world and t0 <= DTG_BASE_S and t1 >= DTG_BASE_S + DTG_SPAN_S:
        return QueryPlan(query, skip_coarse=True)

    ix0, iy0 = lonlat_to_xy(query.lon_min, query.lat_min)
    ix1, iy1 = lonlat_to_xy(query.lon_max, query.lat_max)
    w0, w1 = t0 // SECONDS_PER_WEEK, t1 // SECONDS_PER_WEEK

    plan = QueryPlan(query)
    full_week = None  # interior weeks share one range list (computed once)
    for w in range(w0, w1 + 1):
        # week-edge time bounds (Z3IdxStrategy tLo/tHi semantics)
        lo_s = t0 - w * SECONDS_PER_WEEK if w == w0 else 0
        hi_s = t1 - w * SECONDS_PER_WEEK if w == w1 else SECONDS_PER_WEEK - 1
        it0 = (max(lo_s, 0) * TBITS_N) // SECONDS_PER_WEEK
        it1 = (min(hi_s, SECONDS_PER_WEEK - 1) * TBITS_N) // SECONDS_PER_WEEK
        if lo_s == 0 and hi_s == SECONDS_PER_WEEK - 1:
            if full_week is None:
                full_week = _ranges_arrays(int(ix0), int(ix1), int(iy0), int(iy1),
                                           int(it0), int(it1))
            plan.week_ranges[w] = full_week
        else:
            plan.week_ranges[w] = _ranges_arrays(int(ix0), int(ix1), int(iy0),
                                                 int(iy1), int(it0), int(it1))
    return plan


def _ranges_arrays(ix0, ix1, iy0, iy1, it0, it1):
    r = zranges_3d(ix0, ix1, iy0, iy1, it0, it1)
    return (np.array([a for a, _ in r], dtype=np.int64),
            np.array([b for _, b in r], dtype=np.int64))


def coarse_mask(plan: QueryPlan, week: np.ndarray, z3: np.ndarray) -> np.ndarray:
    """Vectorized z3-in-covering-ranges test (Z3Iterator role)."""
    if plan.skip_coarse:
        return np.ones(len(week), dtype=bool)
    mask = np.zeros(len(week), dtype=bool)
    for w in np.unique(week):
        wr = plan.week_ranges.get(int(w))
        if wr is None:
            continue
        sel = week == w
        z = z3[sel]
        los, his = wr
        if len(los) == 0:
            continue
        idx = np.searchsorted(los, z, "right") - 1
        ok = (idx >= 0) & (z <= his[np.clip(idx, 0, len(his) - 1)])
        mask[sel] = ok
    return mask


def exact_mask(q: SpatialQuery, lon, lat, dtg_s) -> np.ndarray:
    m = (lon >= q.lon_min) & (lon <= q.lon_max) & (lat >= q.lat_min) & (lat <= q.lat_max)
    if q.t_start_s is not None:
        m &= dtg_s >= q.t_start_s
    if q.t_end_s is not None:
        m &= dtg_s <= q.t_end_s
    return m


class _ScanFilter:
    """map_batches kernel: coarse z-range prune then exact refine."""

    def __init__(self, plan: QueryPlan):
        self.plan = plan

    def __call__(self, batch: pa.Table) -> pa.Table:
        week = batch.column("week").to_numpy(zero_copy_only=False)
        z3 = batch.column("z3").to_numpy(zero_copy_only=False)
        m = coarse_mask(self.plan, week, z3)
        if m.any():
            sub = batch.filter(pa.array(m))
            lon = sub.column("lon").to_numpy(zero_copy_only=False)
            lat = sub.column("lat").to_numpy(zero_copy_only=False)
            dtg = sub.column("dtg_s").to_numpy(zero_copy_only=False)
            return sub.filter(pa.array(exact_mask(self.plan.query, lon, lat, dtg)))
        return batch.slice(0, 0)


def scan_or(fixture_dir: str, queries: list[SpatialQuery],
            columns: list[str] | None = None) -> ray.data.Dataset:
    """OR of multiple box queries via the reference's disjoint rewrite:
    arms become A, B AND NOT A, C AND NOT A AND NOT B, ... so the union
    is disjoint and needs NO dedup shuffle
    (``QueryFilterSplitter.scala:210-225``; OR-splitting
    ``QueryPlanner.splitQueryOnOrs:347-365``). Each arm is a pruned scan.
    """
    need = ["image_id", "phash"]
    if columns:
        need = list(dict.fromkeys(need + columns))
    plans = [plan_query(q) for q in queries]

    def all_arms(batch: pa.Table) -> pa.Table:
        # ONE pass: every arm's (coarse, exact, NOT-previous) filter is
        # evaluated on the same derived batch; the disjoint rewrite means
        # the per-arm outputs concatenate without dedup
        week = batch.column("week").to_numpy(zero_copy_only=False)
        z3 = batch.column("z3").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        dtg = batch.column("dtg_s").to_numpy(zero_copy_only=False)
        keep_any = np.zeros(batch.num_rows, dtype=bool)
        for i, plan in enumerate(plans):
            m = coarse_mask(plan, week, z3)
            if not m.any():
                continue
            keep = m & exact_mask(plan.query, lon, lat, dtg)
            for q in queries[:i]:  # the NOT-previous-arms rewrite
                keep &= ~exact_mask(q, lon, lat, dtg)
            keep_any |= keep
        return batch.filter(pa.array(keep_any))

    ds = read_images(fixture_dir, columns=need)
    ds = ds.map_batches(derive_and_encode, batch_format="pyarrow")
    return ds.map_batches(all_arms, batch_format="pyarrow")


def sample_cells(fixture_dir: str, permille: int = 100,
                 query: SpatialQuery | None = None) -> ray.data.Dataset:
    """Deterministic ~permille/1000 sample: keep rows with
    (phash & 1023) < permille * 1024 // 1000 — the spatial-sampling role
    of ``BoundingBoxSampler`` (pseudo-random cell sequence), reproducible
    in SQL. Optionally restricted to a query box."""
    thresh = permille * 1024 // 1000

    def keep(batch: pa.Table) -> pa.Table:
        ph = batch.column("phash").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((ph & np.int64(1023)) < thresh))

    if query is not None:
        return scan(fixture_dir, query).map_batches(keep, batch_format="pyarrow")
    ds = read_images(fixture_dir, columns=["image_id", "phash"])
    return ds.map_batches(keep, batch_format="pyarrow")


def scan(fixture_dir: str, query: SpatialQuery,
         columns: list[str] | None = None) -> ray.data.Dataset:
    """Query the image table: rows whose derived (lon, lat, dtg) fall in
    the box+interval. Reads a skinny projection (image_id + phash [+
    requested columns]) so image payloads never enter the scan.
    """
    need = ["image_id", "phash"]
    if columns:
        need = list(dict.fromkeys(need + columns))
    plan = plan_query(query)
    ds = read_images(fixture_dir, columns=need)
    ds = ds.map_batches(derive_and_encode, batch_format="pyarrow")
    return ds.map_batches(_ScanFilter(plan), batch_format="pyarrow")
