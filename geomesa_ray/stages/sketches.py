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


_POLY_P = np.uint64(1099511628211)  # FNV-1a prime (odd, full-period mod 2^64)


def _hash_string_array(col: pa.Array) -> np.ndarray:
    """Vectorized 64-bit digests of a string column: segmented polynomial
    hash straight over the Arrow UTF-8 data buffer (byte * P^position,
    summed per string via a cumsum difference), splitmix-finalized. No
    per-row Python — the only loop is O(max string length) building the
    power table. Strings need the full 64-bit space: a crc32 pre-hash
    would cap distincts at 2^32 and saturate the estimator at scale."""
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    n = len(col)
    offs = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset:col.offset + n + 1].astype(np.int64)
    lens = offs[1:] - offs[:-1]
    len_mix = splitmix64(lens.astype(np.uint64) ^ np.uint64(0xA5A5A5A5))
    if int(lens.sum()) == 0:
        return splitmix64(len_mix)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    d = data[offs[0]:offs[-1]].astype(np.uint64)
    starts_rel = offs[:-1] - offs[0]
    pos = np.arange(len(d), dtype=np.int64) - np.repeat(starts_rel, lens)
    e = np.repeat(lens, lens) - 1 - pos  # exponent: high byte first
    maxlen = int(lens.max())
    pows = np.empty(maxlen, dtype=np.uint64)
    pows[0] = 1
    with np.errstate(over="ignore"):
        for i in range(1, maxlen):
            pows[i] = pows[i - 1] * _POLY_P
        terms = d * pows[e]
    csum = np.concatenate([np.zeros(1, np.uint64),
                           np.cumsum(terms, dtype=np.uint64)])
    tot = csum[offs[1:] - offs[0]] - csum[starts_rel]
    return splitmix64(tot ^ len_mix)


def _hash_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return splitmix64(col.to_numpy(zero_copy_only=False)
                          .astype(np.int64).view(np.uint64))
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return _hash_string_array(col)
    # fallback for exotic types: per-row repr digest (not a hot path)
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
