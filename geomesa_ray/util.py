"""Shared Ray-Data helpers: broadcast resolution + gather aggregation.

Broadcast pattern: ``ray.put`` once on the driver; tasks capture the
ObjectRef (tiny) and resolve it via a worker-local cache — the object is
fetched into each node's shared memory once and deserialized once per
worker process, never re-shipped per batch. This replaces actor pools for
small-state stages: task-based ``map_batches`` reuses warm workers,
avoiding the ~1s-per-actor spawn cost an actor pool pays on every
pipeline run (actor pools remain the right tool for genuinely expensive
state — codecs, models — see stages/image_ops.py).

Gather aggregation: for BOUNDED-cardinality results (density grids,
histograms, top-k), per-batch combiners shrink the data so far that Ray's
sort-based ``groupby`` shuffle (~5 s fixed cost on 32 cpus) is the wrong
tool; ``repartition(1)`` + a single final combine is the analog of the
reference's client-side final reduce (``QueryPlanner.scala:376-390``) and
is ~7x faster. High-cardinality aggregations (dedup keys, bucket writes)
keep the real shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from collections import OrderedDict

_BCAST_CACHE: OrderedDict = OrderedDict()
# LRU cap (entry count): long driver sessions run many pipelines, each
# broadcasting its own object — bound the per-worker heap. 32 comfortably
# exceeds the number of broadcast-backed pipelines any driver interleaves
# (thrashing would silently reintroduce per-batch deserialization).
# Keyed by ref HEX, not the ObjectRef itself, so a cached entry does NOT
# pin the plasma copy (the submitting task's closure already holds the
# ref while the pipeline runs).
_BCAST_CACHE_MAX = 32


def resolve_broadcast(ref):
    """Worker-local cached ray.get (one deserialization per worker)."""
    if not isinstance(ref, ray.ObjectRef):
        return ref
    key = ref.hex()
    if key in _BCAST_CACHE:
        _BCAST_CACHE.move_to_end(key)
        return _BCAST_CACHE[key]
    val = ray.get(ref)
    _BCAST_CACHE[key] = val
    while len(_BCAST_CACHE) > _BCAST_CACHE_MAX:
        _BCAST_CACHE.popitem(last=False)
    return val


class QueryTimeout(TimeoutError):
    """Raised when a watchdogged query exceeds its wall-clock budget."""


def take_all_with_timeout(ds: ray.data.Dataset, timeout_s: float):
    """Query-timeout watchdog: the reference's query-timeout option
    (configurable scan timeout that aborts long-running queries).

    Consumption runs in a worker thread through ``iter_batches`` with a
    stop flag checked between batches: on timeout the flag is set, the
    thread returns at the next batch boundary, and RELEASING the
    iterator shuts the streaming executor down — in-flight tasks of the
    current wave finish, but no further work is scheduled (the
    reference's thread-interrupt semantics; a single batch that hangs
    inside a kernel is not interruptible there either)."""
    import threading

    result: dict = {}
    stop = threading.Event()

    def run():
        try:
            rows = []
            for b in ds.iter_batches(batch_format="pyarrow"):
                if stop.is_set():
                    return  # releases the iterator -> executor shutdown
                rows.extend(b.to_pylist())
            result["rows"] = rows
        except BaseException as e:  # noqa: BLE001 - surfaced to caller
            result["err"] = e

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(timeout_s)
    if th.is_alive():
        stop.set()
        raise QueryTimeout(f"query exceeded {timeout_s}s wall clock")
    if "err" in result:
        raise result["err"]
    return result["rows"]


def gather_combine(parts: ray.data.Dataset, final_fn,
                   batch_format: str = "pyarrow") -> ray.data.Dataset:
    """Combine pre-aggregated partials in one task (bounded results only)."""
    return parts.repartition(1).map_batches(final_fn, batch_format=batch_format,
                                            batch_size=None)


def sorted_membership(vals: np.ndarray, sorted_keys: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``vals`` in a SORTED key array
    (searchsorted + clip + equality — THE shared semi-join probe)."""
    if len(sorted_keys) == 0:
        return np.zeros(len(vals), dtype=bool)
    pos = np.clip(np.searchsorted(sorted_keys, vals), 0, len(sorted_keys) - 1)
    return sorted_keys[pos] == vals


def id_membership_mask(col, sorted_ids: np.ndarray) -> np.ndarray:
    """String-column wrapper over :func:`sorted_membership`."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(sorted_ids) == 0:
        return np.zeros(len(col), dtype=bool)
    vals = np.asarray(col.to_pylist(), dtype=object)
    return sorted_membership(vals, sorted_ids)


def binary_column_to_matrix(col, nbytes: int) -> np.ndarray:
    """(n, nbytes) uint8 view of a binary column whose values all have
    length ``nbytes`` — zero-copy when the offsets are contiguous (the
    common case for fixture payloads), falling back to a per-row copy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset:col.offset + n + 1]
    if len(offs) == n + 1 and np.all(np.diff(offs) == nbytes):
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        return data[offs[0]:offs[-1]].reshape(n, nbytes)
    return np.stack([np.frombuffer(col[i].as_py(), dtype=np.uint8)
                     for i in range(n)])


def unique_flat_sum(flat: np.ndarray, weights: np.ndarray):
    """(unique keys, summed weights) for an int64 key array."""
    order = np.argsort(flat, kind="stable")
    f = flat[order]
    w = weights[order]
    uniq, start = np.unique(f, return_index=True)
    return uniq, np.add.reduceat(w, start)


def unique_rows_sum(keys: list[np.ndarray], weights: np.ndarray):
    """Group rows by MULTI-column integer keys (lexsort + run detection);
    returns ([unique key columns], summed weights), sorted by key tuple.
    Never packs keys into one scalar — packed int64 keys wrap for ids
    >= 2^31 and collide for ids >= 2^32."""
    n = len(weights)
    if n == 0:
        return [k[:0] for k in keys], weights[:0]
    order = np.lexsort(tuple(reversed(keys)))  # keys[0] = primary
    ks = [k[order] for k in keys]
    w = weights[order]
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for k in ks:
        new[1:] |= k[1:] != k[:-1]
    start = np.nonzero(new)[0]
    return [k[start] for k in ks], np.add.reduceat(w, start)
