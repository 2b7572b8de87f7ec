"""Attribute aggregates + the attribute->record lookup join.

Reference parity:
- Unique attribute values with counts (``process/unique/UniqueProcess.scala:35-110``,
  ``iterators/UniqueAttributeIterator.scala``) -> ``groupby(col).count()``.
- Histogram job — group-by attribute list, count per group
  (``geomesa-jobs/.../analytics/HistogramJob.scala:33-76``).
- CountByDay (``compute/spark/GeoMesaSpark.scala:156-166``) -> day-string
  keyed count.
- Min/max time visitor (``MinMaxTimeVisitor.scala``) -> streaming per-batch
  partial min/max, combined driver-side (no shuffle).
- Attribute-index -> record-table join (``AttributeIdxStrategy.scala:121-164``,
  ``BatchMultiScanner.scala:21-40``): scan a secondary attribute filter,
  then look up full records by key. Ray-Data shape: broadcast semi-join —
  the filtered small side is collected once, ``ray.put``, and probed
  vectorized inside ``map_batches`` (no all-to-all shuffle); precedent is
  the reference's 32768-entry batched lookup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from geomesa_ray.sources.io import read_table


def _rename(ds: ray.data.Dataset, names: list[str]) -> ray.data.Dataset:
    return ds.map_batches(lambda b: b.rename_columns(names), batch_format="pyarrow")


def unique_values(sf_dir: str, table: str, col: str) -> ray.data.Dataset:
    """Distinct values of one attribute with counts."""
    ds = read_table(sf_dir, table, columns=[col])
    return _rename(ds.groupby(col).count(), [col, "cnt"])


def histogram(sf_dir: str, table: str, cols: list[str]) -> ray.data.Dataset:
    """Group-by a list of attributes, count per group (HistogramJob)."""
    ds = read_table(sf_dir, table, columns=list(cols))
    return _rename(ds.groupby(list(cols)).count(), list(cols) + ["cnt"])


def count_by_day(sf_dir: str, table: str = "orders",
                 ts_col: str = "o_orderdate") -> ray.data.Dataset:
    """Day-string keyed count (GeoMesaSpark.countByDay)."""

    def day_col(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = (ts // 86_400_000_000).astype("datetime64[D]").astype("U10")
        return pa.table({"day": pa.array(days.tolist(), pa.string())})

    ds = read_table(sf_dir, table, columns=[ts_col])
    keyed = ds.map_batches(day_col, batch_format="pyarrow")
    return _rename(keyed.groupby("day").count(), ["day", "cnt"])


def minmax_time(sf_dir: str, table: str = "lineitem",
                ts_col: str = "l_shipdate") -> pa.Table:
    """Single-row (tmin, tmax) — per-batch partials, driver combine."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"tmin": pa.array([int(ts.min())]),
                         "tmax": pa.array([int(ts.max())])})

    ds = read_table(sf_dir, table, columns=[ts_col]).map_batches(
        partial, batch_format="pyarrow")
    rows = ds.take_all()  # one tiny row per block
    tmin = min(r["tmin"] for r in rows)
    tmax = max(r["tmax"] for r in rows)
    return pa.table({"tmin": pa.array([tmin], pa.int64()).cast(pa.timestamp("us")),
                     "tmax": pa.array([tmax], pa.int64()).cast(pa.timestamp("us"))})


def attr_record_join(sf_dir: str, size_below: int = 10) -> ray.data.Dataset:
    """Broadcast semi-join: lineitem rows whose part has p_size < N,
    emitting (l_orderkey, l_partkey, p_size)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import os

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_size"])
    part = part.filter(pc.field("p_size") < size_below)
    keys = part.column("p_partkey").to_numpy()
    sizes = part.column("p_size").to_numpy()
    order = np.argsort(keys)
    lookup_ref = ray.put((keys[order], sizes[order]))

    class Probe:
        def __init__(self, ref):
            self.keys, self.sizes = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.keys, pk)
            pos_c = np.clip(pos, 0, len(self.keys) - 1)
            hit = (len(self.keys) > 0) & (self.keys[pos_c] == pk)
            sel = np.nonzero(hit)[0]
            return pa.table({
                "l_orderkey": batch.column("l_orderkey").take(pa.array(sel)),
                "l_partkey": batch.column("l_partkey").take(pa.array(sel)),
                "p_size": pa.array(self.sizes[pos_c[sel]].astype(np.int32)),
            })

    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    return ds.map_batches(Probe, fn_constructor_args=(lookup_ref,),
                          batch_format="pyarrow", concurrency=(1, 8))
