"""Query strategy decider — the cost-based plan chooser.

Reference parity: ``QueryStrategyDecider.chooseStrategies``
(``QueryStrategyDecider.scala:68-115``) partitions a query's predicates
into ID / attribute / spatio-temporal groups and picks the cheapest
strategy by fixed costs: record(id)=1, attribute=1..MaxInt by declared
cardinality, z3=200 (point+time), st=400 (spatial only)
(``RecordIdxStrategy.scala:30``, ``AttributeIdxStrategy.scala:172-198``,
``Z3IdxStrategy.scala:193-194``, ``STIdxStrategy.scala:255``). The same
constants order our strategies; a ``strategy_override`` kwarg mirrors the
reference's QUERY_STRATEGY_KEY hint (``QueryPlanner.scala:248-270``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

import numpy as np
import pyarrow as pa

import ray.data


class Strategy(Enum):
    RECORD = "record"       # id-filter lookup
    ATTRIBUTE = "attribute"  # secondary-attribute predicate
    Z3 = "z3"               # bbox + time interval
    ST = "st"               # bbox only (cell prune, full time)

    @property
    def cost(self) -> int:
        return {Strategy.RECORD: 1, Strategy.ATTRIBUTE: 100,
                Strategy.Z3: 200, Strategy.ST: 400}[self]


@dataclass
class QuerySpec:
    """Predicate bundle: any combination of id set, attribute equality,
    bbox, time interval."""

    ids: list[str] | None = None           # image_id IN (...)
    id_sets: list[list[str]] | None = None  # AND of several id filters
    attr_eq: dict = field(default_factory=dict)  # {col: value}
    # {col: (lo, hi)} closed bounds, or (lo, hi, lo_strict, hi_strict)
    # for open bounds (CQL < / >); either bound may be None
    attr_range: dict = field(default_factory=dict)
    bbox: tuple | None = None              # (lon0, lon1, lat0, lat1)
    interval_s: tuple | None = None        # (t0, t1) unix seconds


def normalize_range(rng: tuple) -> tuple:
    """Range tuple -> canonical (lo, hi, lo_strict, hi_strict)."""
    if len(rng) == 2:
        return (rng[0], rng[1], False, False)
    return tuple(rng)


def intersect_ranges(a: tuple, b: tuple) -> tuple:
    """Conjoin two ranges on the same column (AND = intersection,
    stricter bound wins on a tie)."""
    alo, ahi, als, ahs = normalize_range(a)
    blo, bhi, bls, bhs = normalize_range(b)
    if alo is None or (blo is not None and blo > alo):
        lo, ls = blo, bls
    elif blo is None or alo > blo:
        lo, ls = alo, als
    else:
        lo, ls = alo, als or bls
    if ahi is None or (bhi is not None and bhi < ahi):
        hi, hs = bhi, bhs
    elif bhi is None or ahi < bhi:
        hi, hs = ahi, ahs
    else:
        hi, hs = ahi, ahs or bhs
    return (lo, hi, ls, hs)


def intersect_id_sets(spec: QuerySpec) -> list[str] | None:
    """AND of Id filters = plan-time set intersection
    (``RecordIdxStrategy.scala:32-41``)."""
    sets = []
    if spec.ids is not None:
        sets.append(set(spec.ids))
    for s in spec.id_sets or []:
        sets.append(set(s))
    if not sets:
        return None
    out = sets[0]
    for s in sets[1:]:
        out &= s
    return sorted(out)


def choose_strategy(spec: QuerySpec, override: Strategy | None = None) -> Strategy:
    if override is not None:
        return override
    candidates = []
    if spec.ids is not None or spec.id_sets:
        candidates.append(Strategy.RECORD)
    if spec.attr_eq or spec.attr_range:
        candidates.append(Strategy.ATTRIBUTE)
    if spec.bbox is not None and spec.interval_s is not None:
        candidates.append(Strategy.Z3)
    elif spec.bbox is not None:
        candidates.append(Strategy.ST)
    if not candidates:
        candidates.append(Strategy.ST)  # full scan fallback
    return min(candidates, key=lambda s: s.cost)


def record_lookup(fixture_dir: str, ids: list[str],
                  columns: list[str] | None = None,
                  source_ds: ray.data.Dataset | None = None) -> ray.data.Dataset:
    """Record-index lookup: rows by exact id set (RecordIdxStrategy).
    The id set is broadcast-sorted; probe is a vectorized searchsorted
    (the 32768-entry batched-lookup precedent). ``source_ds`` overrides
    the default fixture read (e.g. the engine's attached store)."""
    from geomesa_ray.sources.io import read_images
    from geomesa_ray.util import id_membership_mask

    want = np.array(sorted(ids), dtype=object)

    def probe(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(
            id_membership_mask(batch.column("image_id"), want)))

    if source_ds is None:
        need = columns if columns is not None \
            else ["image_id", "phash", "caption"]
        source_ds = read_images(fixture_dir, columns=need)
    return source_ds.map_batches(probe, batch_format="pyarrow")
