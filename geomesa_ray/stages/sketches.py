"""Mergeable sketches: HyperLogLog approximate distinct count.

The reference era has no sketches (cardinality is a user-declared hint,
``AttributeIdxStrategy.getCost``); large-scale training-data pipelines
need them, and they are the canonical Ray-Data aggregation shape: one
serialized sketch per batch (a few KB regardless of input size), merged
register-wise in a tiny second stage — the sketch IS the combiner.

Standard HLL (Flajolet et al.): p-bit register index, rank of the
remaining hash bits, harmonic-mean estimator with small/large-range
corrections. Deterministic (splitmix64 hashing), ~1.04/sqrt(2^p)
relative error.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from geomesa_ray.sources.fixtures import splitmix64
from geomesa_ray.util import gather_combine


def _hash_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return splitmix64(col.to_numpy(zero_copy_only=False)
                          .astype(np.int64).view(np.uint64))
    # strings need a full 64-bit digest: a bare crc32 pre-hash would cap
    # the distinct space at 2^32 and saturate the estimator at scale.
    # Two salted crc32 halves (cheap C loop) + splitmix finalizer give an
    # effective 64-bit space without a per-row cryptographic hash.
    import zlib

    h = np.array(
        [zlib.crc32(b) | (zlib.crc32(b + b"#") << 32)
         for b in (str(v).encode() for v in col.to_pylist())],
        dtype=np.uint64)
    return splitmix64(h)


def hll_registers(h: np.ndarray, p: int) -> np.ndarray:
    """uint64 hashes -> max-rank registers (length 2^p, uint8)."""
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # rank = leading zeros of `rest` + 1 (sentinel bit bounds it)
    # rank = leading zeros + 1 = 64 - floor(log2(v)); the sentinel bit
    # guarantees v > 0. Clip guards the float-rounding edge where a value
    # near 2^64 rounds up and log2 returns exactly 64.
    v = rest.astype(np.float64)
    rank = np.clip(64 - np.floor(np.log2(v)), 1, 64).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return float(est)


def approx_distinct(sf_dir_table_col, table: str | None = None,
                    col: str | None = None, p: int = 12) -> ray.data.Dataset:
    """(approx_distinct,) — one row. Per-batch sketches merge by
    register-wise max in one combine task."""
    from geomesa_ray.sources.io import read_table

    sf_dir = sf_dir_table_col

    def partial(batch: pa.Table) -> pa.Table:
        h = _hash_column(batch.column(col))
        regs = hll_registers(h, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    def final(batch: pa.Table) -> pa.Table:
        merged = np.zeros(1 << p, dtype=np.uint8)
        for b in batch.column("regs").to_pylist():
            merged = np.maximum(merged, np.frombuffer(b, dtype=np.uint8))
        return pa.table({"approx_distinct": pa.array(
            [int(round(hll_estimate(merged)))], pa.int64())})

    ds = read_table(sf_dir, table, columns=[col])
    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return gather_combine(parts, final)
