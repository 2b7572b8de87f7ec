"""phash -> geometry derivation (the engine's ingest keying step).

Per the north star, geometry is derived from image metadata: the phash's
low 32 bits seed longitude, the high 32 bits seed latitude, and
``phash mod 4 weeks`` (sign-masked) seeds the timestamp. The arithmetic
below is written with the exact operation order mirrored by the DuckDB
oracle SQL (geomesa_ray/oracle_gen.py) so both produce bit-identical
doubles. Role parity: the reference's converter DSL geometry constructors
(``geomesa-convert/.../Transformers.scala:363-586``) + Z3 write keying
(``Z3Table.scala:120-139``), fused into one vectorized map_batches kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geomesa_ray.sources.fixtures import DTG_BASE_S, DTG_SPAN_S

I64 = np.int64
MASK32 = I64(0xFFFFFFFF)
MASK63 = I64(0x7FFFFFFFFFFFFFFF)


def phash_to_lonlat(phash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """int64 phash -> (lon, lat) float64. Matches SQL:
    (CAST(phash & 4294967295 AS DOUBLE) / 4294967296) * 360 - 180 etc."""
    phash = np.asarray(phash, dtype=I64)
    lon = (phash & MASK32).astype(np.float64) / 4294967296.0 * 360.0 - 180.0
    lat = ((phash >> I64(32)) & MASK32).astype(np.float64) / 4294967296.0 * 180.0 - 90.0
    return lon, lat


def phash_to_dtg_s(phash: np.ndarray) -> np.ndarray:
    """int64 phash -> unix seconds in [DTG_BASE_S, DTG_BASE_S + 4 weeks)."""
    phash = np.asarray(phash, dtype=I64)
    return (phash & MASK63) % I64(DTG_SPAN_S) + I64(DTG_BASE_S)


def derive_geometry(batch: pa.Table) -> pa.Table:
    """map_batches kernel: add lon, lat, dtg_s (epoch seconds), dtg columns.

    Zero-copy in (pyarrow batch), three vectorized NumPy expressions out.
    """
    # idempotent per column (store rows already carry these): a second
    # append would create duplicate fields
    need = [c for c in ("lon", "lat", "dtg_s", "dtg")
            if c not in batch.schema.names]
    if not need:
        return batch
    phash = batch.column("phash").to_numpy(zero_copy_only=False)
    lon, lat = phash_to_lonlat(phash)
    dtg_s = phash_to_dtg_s(phash)
    if "lon" in need:
        batch = batch.append_column("lon", pa.array(lon))
    if "lat" in need:
        batch = batch.append_column("lat", pa.array(lat))
    if "dtg_s" in need:
        batch = batch.append_column("dtg_s", pa.array(dtg_s))
    if "dtg" in need:
        batch = batch.append_column(
            "dtg", pa.array(dtg_s * 1_000_000, type=pa.timestamp("us")))
    return batch
