"""Attribute aggregates + the attribute->record lookup join.

Reference parity:
- Unique attribute values with counts (``process/unique/UniqueProcess.scala:35-110``,
  ``iterators/UniqueAttributeIterator.scala``).
- Histogram job — group-by attribute list, count per group
  (``geomesa-jobs/.../analytics/HistogramJob.scala:33-76``).
- CountByDay (``compute/spark/GeoMesaSpark.scala:156-166``).
- Min/max time visitor (``MinMaxTimeVisitor.scala``).
- Attribute-index -> record-table join (``AttributeIdxStrategy.scala:121-164``,
  ``BatchMultiScanner.scala:21-40``).

Execution shape: these aggregates have BOUNDED key cardinality (attribute
domains, day strings), so each batch pre-aggregates to counts and ONE
final combine task merges them (client-side-reduce analog) — no all-to-all
shuffle. The lookup join broadcasts its filtered small side (``ray.put`` +
worker-cached resolve) and probes it vectorized inside task-based
``map_batches`` — reference precedent is the 32768-entry batched lookup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from geomesa_ray.sources.io import read_table
from geomesa_ray.util import gather_combine, resolve_broadcast


def _counted(ds: ray.data.Dataset, key_cols: list[str]) -> ray.data.Dataset:
    """Partial per-batch counts + single final combine -> (keys..., cnt).
    Both stages are ``pa.Table.group_by`` — no per-batch pandas
    round-trip (the partial runs on every block of the input)."""

    # rename the aggregate output columns BY NAME (pyarrow's output
    # column order has differed across versions; positional renames
    # would silently swap key/count names on an upgrade)
    def _to_cnt(out: pa.Table, agg_name: str) -> pa.Table:
        return out.select([*key_cols, agg_name]) \
            .rename_columns([*key_cols, "cnt"])

    def partial(batch: pa.Table) -> pa.Table:
        out = batch.select(key_cols).group_by(key_cols).aggregate(
            [([], "count_all")])
        return _to_cnt(out, "count_all")

    def final(batch: pa.Table) -> pa.Table:
        out = batch.group_by(key_cols).aggregate([("cnt", "sum")])
        return _to_cnt(out, "cnt_sum")

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return gather_combine(parts, final)


def unique_values(sf_dir: str, table: str, col: str) -> ray.data.Dataset:
    """Distinct values of one attribute with counts."""
    return _counted(read_table(sf_dir, table, columns=[col]), [col])


def histogram_job(sf_dir: str, table: str, attribute: str,
                  group_by: list[str] | tuple = (),
                  unique_by: list[str] | tuple = (),
                  value_regex: str | None = None,
                  n_parts: int = 64) -> ray.data.Dataset:
    """``HistogramJob`` analog: histogram of one attribute, optionally
    grouped by other attributes, de-duplicated by UNIQUE_BY attributes,
    and value-filtered by regex
    (``geomesa-jobs/.../analytics/HistogramJob.scala:33-107``).

    Semantics preserved from the reference: every key column is
    STRINGIFIED with null/empty -> "null" (``safeString``,
    ``HistogramJob.scala:128-136``); with ``unique_by`` the input is
    first reduced to one row per distinct (group_by + unique_by +
    attribute) combination, then counted per (group_by + attribute) —
    i.e. the count becomes "distinct unique_by combos" (the reference's
    groupBy + mapValueStream head, ``:84-88``); at most 8 group/unique
    attributes (``:66``). ``value_regex`` is RE2 via
    ``pc.match_substring_regex`` (DuckDB ``regexp_matches`` parity).

    Scale shape: distinct-combo cardinality is input-proportional, so
    the dedup stage is per-batch ``pa.Table.group_by`` distinct followed
    by a hash-bucketed groupby merge (``hash(full key) % n_parts``
    partitions, each merged vectorized) — no single-task combine holds
    the distinct set. The final histogram count reuses :func:`_counted`
    (bounded by the histogram's own output cardinality).
    """
    import pyarrow.compute as pc

    group_by, unique_by = list(group_by), list(unique_by)
    if len(group_by) + len(unique_by) >= 9:
        raise ValueError(
            "Can't group by + unique by more than 8 attributes")
    key = [*group_by, attribute]
    full = list(dict.fromkeys([*group_by, *unique_by, attribute]))
    ds = read_table(sf_dir, table, columns=full)

    def prep(batch: pa.Table) -> pa.Table:
        out = {}
        for c in full:
            s = pc.cast(batch.column(c), pa.string())
            s = pc.if_else(pc.or_kleene(pc.is_null(s), pc.equal(s, "")),
                           "null", s)
            out[c] = s
        t = pa.table(out)
        if value_regex is not None:
            t = t.filter(pc.match_substring_regex(t.column(attribute),
                                                  value_regex))
        return t

    ds = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)

    if unique_by:
        from geomesa_ray.sources.fixtures import splitmix64
        from geomesa_ray.stages.sketches import _hash_string_array

        def dedup_part(batch: pa.Table) -> pa.Table:
            t = batch.group_by(full).aggregate([])  # per-batch distinct
            h = np.zeros(t.num_rows, dtype=np.uint64)
            for c in full:
                col = t.column(c)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                h = splitmix64(h ^ _hash_string_array(col))
            part = (h % np.uint64(n_parts)).astype(np.int64)
            return t.append_column("part", pa.array(part))

        def distinct(group: pa.Table) -> pa.Table:
            return group.drop_columns(["part"]).group_by(full).aggregate([])

        ds = ds.map_batches(dedup_part, batch_format="pyarrow") \
            .groupby("part").map_groups(distinct, batch_format="pyarrow")

    return _counted(ds, key)


def histogram(sf_dir: str, table: str, cols: list[str]) -> ray.data.Dataset:
    """Group-by a list of attributes, count per group (HistogramJob)."""
    return _counted(read_table(sf_dir, table, columns=list(cols)), list(cols))


def count_by_day(sf_dir: str, table: str = "orders",
                 ts_col: str = "o_orderdate") -> ray.data.Dataset:
    """Day-string keyed count (GeoMesaSpark.countByDay)."""

    def day_col(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = (ts // 86_400_000_000).astype("datetime64[D]").astype("U10")
        return pa.table({"day": pa.array(days.tolist(), pa.string())})

    ds = read_table(sf_dir, table, columns=[ts_col])
    keyed = ds.map_batches(day_col, batch_format="pyarrow", batch_size=65536)
    return _counted(keyed, ["day"])


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


def pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-flavoured multi-aggregate over lineitem, with all sums in
    integer domains (cents / basis points) so the DuckDB oracle matches
    bit-exactly (float sums are order-dependent): per (returnflag,
    linestatus): row count, sum quantity, revenue in cent-bp =
    round(price*100) * (100 - round(discount*100))."""

    keys = ["l_returnflag", "l_linestatus"]

    def partial(batch: pa.Table) -> pa.Table:
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        cents = np.round(batch.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        disc = np.round(batch.column("l_discount")
                        .to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        t = pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "cnt": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "sum_qty": pa.array(qty.astype(np.int64)),
            "revenue_centbp": pa.array(cents * (100 - disc)),
        })
        out = t.group_by(keys).aggregate(
            [("cnt", "sum"), ("sum_qty", "sum"), ("revenue_centbp", "sum")])
        return out.select([*keys, "cnt_sum", "sum_qty_sum",
                           "revenue_centbp_sum"]) \
            .rename_columns([*keys, "cnt", "sum_qty", "revenue_centbp"])

    def final(batch: pa.Table) -> pa.Table:
        out = batch.group_by(keys).aggregate(
            [("cnt", "sum"), ("sum_qty", "sum"), ("revenue_centbp", "sum")])
        return out.select([*keys, "cnt_sum", "sum_qty_sum",
                           "revenue_centbp_sum"]) \
            .rename_columns([*keys, "cnt", "sum_qty", "revenue_centbp"])

    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity",
                             "l_extendedprice", "l_discount"])
    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=131072)
    return gather_combine(parts, final)


def map_value_agg(sf_dir: str) -> ray.data.Dataset:
    """Map-value aggregation (``MapAggregatingIterator.scala:32-79``
    analog) over a REAL ``map<string, int64>`` column: the events' props
    JSON parses into an arrow map (converter fn ``jsonMap``,
    SimpleFeatureTypes.scala:206-213 Map[K,V] attribute), entries explode
    and merge elementwise per event_type -> (event_type, key, sum_val).
    DuckDB oracle builds the same MAP and unnests it."""
    from geomesa_ray.functions.registry import FUNCTIONS

    def partial(batch: pa.Table) -> pa.Table:
        from geomesa_ray.functions.registry import map_offsets

        m = FUNCTIONS["jsonMap"](batch, "col:props")
        # per-row entry counts; null maps (absent props) contribute 0
        counts = np.diff(map_offsets(m))
        et = batch.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        rep = pa.array(np.repeat(np.arange(len(counts)), counts))
        t = pa.table({"event_type": et.take(rep),
                      "key": m.keys, "val": m.items})
        out = t.group_by(["event_type", "key"]).aggregate([("val", "sum")])
        return out.select(["event_type", "key", "val_sum"]) \
            .rename_columns(["event_type", "key", "sum_val"])

    def final(batch: pa.Table) -> pa.Table:
        out = batch.group_by(["event_type", "key"]).aggregate(
            [("sum_val", "sum")])
        return out.select(["event_type", "key", "sum_val_sum"]) \
            .rename_columns(["event_type", "key", "sum_val"])

    ds = read_table(sf_dir, "events", columns=["event_type", "props"])
    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=131072)
    return gather_combine(parts, final)


def shipping_revenue(sf_dir: str, cutoff: str = "1998-01-01") -> ray.data.Dataset:
    """TPC-H Q3-flavoured join chain: revenue (integer cent-bp domain) of
    lineitems shipped after the cutoff whose order was placed before it —
    (l_orderkey, revenue_centbp). Broadcast semi-join on the filtered
    order-key set + per-batch partial sums + one combine."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    cutoff_us = int(np.datetime64(cutoff, "us").astype(np.int64))
    orders = pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                           columns=["o_orderkey", "o_orderdate"])
    keys = orders.filter(
        pc.less(orders.column("o_orderdate"),
                pa.scalar(cutoff_us, pa.timestamp("us")))
    ).column("o_orderkey").to_numpy()
    ref = ray.put(np.sort(keys))

    def partial(batch: pa.Table) -> pa.Table:
        from geomesa_ray.util import sorted_membership

        okeys = resolve_broadcast(ref)
        ship = batch.column("l_shipdate").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        m = (ship > cutoff_us) & sorted_membership(ok, okeys)
        sel = np.nonzero(m)[0]
        cents = np.round(batch.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False)[sel] * 100.0) \
            .astype(np.int64)
        disc = np.round(batch.column("l_discount")
                        .to_numpy(zero_copy_only=False)[sel] * 100.0) \
            .astype(np.int64)
        rev = cents * (100 - disc)
        uniq, sums = _sum_by_int_key(ok[sel], rev)
        return pa.table({"l_orderkey": pa.array(uniq),
                         "revenue_centbp": pa.array(sums)})

    def final(batch: pa.Table) -> pa.Table:
        uniq, sums = _sum_by_int_key(
            batch.column("l_orderkey").to_numpy(zero_copy_only=False),
            batch.column("revenue_centbp").to_numpy(zero_copy_only=False))
        return pa.table({"l_orderkey": pa.array(uniq),
                         "revenue_centbp": pa.array(sums)})

    ds = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_shipdate", "l_extendedprice",
                             "l_discount"])
    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=131072)
    return gather_combine(parts, final)


def _sum_by_int_key(keys: np.ndarray, vals: np.ndarray):
    order = np.argsort(keys, kind="stable")
    k, v = keys[order], vals[order]
    uniq, start = np.unique(k, return_index=True)
    return uniq, np.add.reduceat(v, start) if len(v) else v


def attr_record_join(sf_dir: str, size_below: int = 10) -> ray.data.Dataset:
    """Broadcast semi-join: lineitem rows whose part has p_size < N,
    emitting (l_orderkey, l_partkey, p_size)."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_size"])
    part = part.filter(pc.field("p_size") < size_below)
    keys = part.column("p_partkey").to_numpy()
    sizes = part.column("p_size").to_numpy()
    order = np.argsort(keys)
    ref = ray.put((keys[order], sizes[order]))

    def probe(batch: pa.Table) -> pa.Table:
        from geomesa_ray.util import sorted_membership

        keys_s, sizes_s = resolve_broadcast(ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        sel = np.nonzero(sorted_membership(pk, keys_s))[0]
        pos_sel = np.searchsorted(keys_s, pk[sel]) if len(keys_s) else sel
        return pa.table({
            "l_orderkey": batch.column("l_orderkey").take(pa.array(sel)),
            "l_partkey": batch.column("l_partkey").take(pa.array(sel)),
            "p_size": pa.array(sizes_s[pos_sel].astype(np.int32)),
        })

    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    return ds.map_batches(probe, batch_format="pyarrow", batch_size=65536)
