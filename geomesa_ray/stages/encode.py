"""Curve-key encoding stages: add week / z3 / cell columns to a batch.

These are the Ray-Data analog of the reference's index-table row keys:
- (week, z3) <-> the Z3 table row key ``epochWeek ‖ z3 ‖ id``
  (``Z3Table.scala:120-139``); here they become plain Arrow columns used
  as sort / partition / prune keys.
- cell (level-L Z2 Morton id) <-> the geohash string prefix of the ST
  index (``IndexSchema.scala:21-56``); hierarchical by right-shift.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geomesa_ray.curve.sfc import Z2Grid, Z3SFC
from geomesa_ray.stages.derive import derive_geometry

DEFAULT_CELL_LEVEL = 12

_sfc = Z3SFC()


def encode_keys(batch: pa.Table, cell_level: int = DEFAULT_CELL_LEVEL) -> pa.Table:
    """Add week:int64, z3:int64, cell:int64 (level-`cell_level` Z2 id).

    Requires lon/lat/dtg_s columns (run :func:`derive_geometry` first).
    """
    # idempotent per column: store rows already CARRY these keys (and a
    # store's cell may use a non-default cell_level) — appending again
    # would produce a duplicate field and poison every later
    # column-by-name access
    need = [c for c in ("week", "z3", "cell")
            if c not in batch.schema.names]
    if not need:
        return batch
    lon = batch.column("lon").to_numpy(zero_copy_only=False)
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    dtg_s = batch.column("dtg_s").to_numpy(zero_copy_only=False)
    week, z3 = _sfc.index(lon, lat, dtg_s)
    if "week" in need:
        batch = batch.append_column("week", pa.array(week))
    if "z3" in need:
        batch = batch.append_column("z3", pa.array(z3))
    if "cell" in need:
        batch = batch.append_column(
            "cell", pa.array(Z2Grid(cell_level).encode(lon, lat)))
    return batch


def derive_and_encode(batch: pa.Table, cell_level: int = DEFAULT_CELL_LEVEL) -> pa.Table:
    """Fused ingest kernel: phash -> lon/lat/dtg -> week/z3/cell."""
    return encode_keys(derive_geometry(batch), cell_level)


def add_shard(batch: pa.Table, num_shards: int = 16) -> pa.Table:
    """Salt column for hot-cell splitting: shard = mix(image-row hash) % N.

    Precedent: the reference's random-shard partitioner (``%999#r``,
    ``IndexSchema.scala:108-113``) and the 4-bit murmur shard in Z3 feature
    ids (``Z3FeatureIdGenerator.scala:66-80``).
    """
    from geomesa_ray.sources.fixtures import splitmix64

    phash = batch.column("phash").to_numpy(zero_copy_only=False)
    shard = (splitmix64(phash.view(np.uint64)) % np.uint64(num_shards)).astype(np.int32)
    return batch.append_column("shard", pa.array(shard))
