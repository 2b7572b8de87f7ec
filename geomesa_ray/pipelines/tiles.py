"""Raster <-> vector tiling: tile assignment + per-tile mosaic.

Reference parity: rasters are keyed by ``lexicoded(resolution) ~ geohash``
(``geomesa-raster/.../index/RasterEntry.scala:60-80``); queries pick the
finest available resolution <= requested, else the minimum
(``AccumuloRasterQueryPlanner.scala:95-107``), fetch the tile cells and
mosaic chunks onto a canvas (``util/RasterUtils.scala:101-162``).

Ray-Data shape: tile id = (level, Z2 cell) as plain columns; the mosaic is
``groupby(tile).map_groups`` averaging member images (a deterministic
stand-in for canvas composition — real decoders are actor-pool stages in
stages/image_ops.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from geomesa_ray.sources.io import read_images
from geomesa_ray.stages.encode import derive_and_encode

DEFAULT_TILE_LEVEL = 8


def select_level(available: list[int], requested: int) -> int:
    """Finest available level <= requested, else the coarsest available
    (AccumuloRasterQueryPlanner.scala:95-107 resolution selection)."""
    le = [a for a in available if a <= requested]
    return max(le) if le else min(available)


def box_tile_relations(lon0: float, lon1: float, lat0: float, lat1: float,
                       level: int = 4) -> pa.Table:
    """DE-9IM relation of every level-L tile against a query box,
    excluding 'disjoint' — the predicate surface raster queries need:
    ``AccumuloRasterQueryPlanner.scala:36-37,111-116`` selects tiles by
    interior-intersects AND NOT touches, so edge-adjacent tiles must be
    classified 'touches' and dropped, not fetched.

    For axis-aligned boxes the full DE-9IM matrix collapses to interval
    logic, fully vectorized over the tile grid:
      equals   — identical bounds
      contains — tile strictly-or-equal contains the query box
      within   — tile inside the query box
      overlaps — interiors intersect, neither contains the other
      touches  — closed boxes intersect but interiors do not
    Returns (tile, relation, interior) where ``interior`` is the raster
    planner's fetch predicate (interior-intersects ∧ ¬touches).
    """
    n = 1 << level
    w = 360.0 / float(n)
    h = 180.0 / float(n)
    ix, iy = np.meshgrid(np.arange(n, dtype=np.int64),
                         np.arange(n, dtype=np.int64), indexing="ij")
    ix, iy = ix.ravel(), iy.ravel()
    tx0 = -180.0 + ix.astype(np.float64) * w
    tx1 = -180.0 + (ix + 1).astype(np.float64) * w
    ty0 = -90.0 + iy.astype(np.float64) * h
    ty1 = -90.0 + (iy + 1).astype(np.float64) * h

    closed = (tx0 <= lon1) & (lon0 <= tx1) & (ty0 <= lat1) & (lat0 <= ty1)
    interior = (tx0 < lon1) & (lon0 < tx1) & (ty0 < lat1) & (lat0 < ty1)
    tile_contains = (tx0 <= lon0) & (tx1 >= lon1) & (ty0 <= lat0) & (ty1 >= lat1)
    tile_within = (tx0 >= lon0) & (tx1 <= lon1) & (ty0 >= lat0) & (ty1 <= lat1)
    equals = tile_contains & tile_within

    rel = np.full(len(ix), "disjoint", dtype=object)
    rel[closed & ~interior] = "touches"
    rel[interior] = "overlaps"
    rel[interior & tile_within] = "within"
    rel[interior & tile_contains] = "contains"
    rel[equals] = "equals"

    keep = np.nonzero(closed)[0]
    from geomesa_ray.curve.zorder import z2_encode

    tile = z2_encode(ix[keep].astype(np.uint64),
                     iy[keep].astype(np.uint64)).view(np.int64)
    return pa.table({
        "tile": pa.array(tile),
        "relation": pa.array(rel[keep].tolist(), pa.string()),
        "interior": pa.array(interior[keep]),
    })


def tile_assignment(fixture_dir: str, level: int = DEFAULT_TILE_LEVEL) -> ray.data.Dataset:
    """(image_id, level, tile) for every image — zero-shuffle keying."""

    def assign(batch: pa.Table) -> pa.Table:
        batch = derive_and_encode(batch, cell_level=level)
        n = batch.num_rows
        return pa.table({
            "image_id": batch.column("image_id"),
            "level": pa.array(np.full(n, level, dtype=np.int64)),
            "tile": batch.column("cell"),
        })

    ds = read_images(fixture_dir, columns=["image_id", "phash"])
    return ds.map_batches(assign, batch_format="pyarrow")


def mosaic(fixture_dir: str, level: int = DEFAULT_TILE_LEVEL,
           w: int = 8, h: int = 8) -> ray.data.Dataset:
    """Per-tile mosaic: mean of member images' pixels (uint8 canvas) +
    member count.

    Shape: tiles are SPARSE relative to rows (at level 8, ~1 row per tile
    per batch), so per-batch partial sums don't shrink anything and
    float64 sums would inflate shuffle bytes 8x. Instead the raw payload
    shuffles ONCE keyed by a tile-prefix bucket (the honest co-location
    cost of mosaicking), and each bucket does a vectorized segmented
    reduction (sort + np.add.reduceat) over all its tiles — a few hundred
    bucket UDF calls, not one per tile.
    """
    nb = w * h * 3
    bucket_level = max(level - 4, 0)  # 4^4 = 256 tiles per bucket group
    shift = 2 * (level - bucket_level)

    def keyed(batch: pa.Table) -> pa.Table:
        b = derive_and_encode(batch, cell_level=level)
        cell = b.column("cell")
        bucket = pa.array(cell.to_numpy(zero_copy_only=False) >> np.int64(shift))
        return pa.table({"tile": cell, "bucket": bucket,
                         "bytes": b.column("bytes")})

    def combine(group: pa.Table) -> pa.Table:
        from geomesa_ray.util import binary_column_to_matrix

        tile = group.column("tile").to_numpy(zero_copy_only=False)
        px = binary_column_to_matrix(group.column("bytes"), nb).astype(np.float64)
        order = np.argsort(tile, kind="stable")
        tile_s = tile[order]
        uniq, start = np.unique(tile_s, return_index=True)
        tot = np.add.reduceat(px[order], start, axis=0)
        cnt = np.diff(np.append(start, len(tile_s)))
        canvases = np.round(tot / cnt[:, None]).astype(np.uint8)
        offsets = pa.array(np.arange(len(uniq) + 1, dtype=np.int32) * nb)
        tile_bytes = pa.BinaryArray.from_buffers(
            pa.binary(), len(uniq),
            [None, offsets.buffers()[1],
             pa.py_buffer(np.ascontiguousarray(canvases).tobytes())])
        return pa.table({
            "level": pa.array(np.full(len(uniq), level, dtype=np.int64)),
            "tile": pa.array(uniq),
            "n_images": pa.array(cnt.astype(np.int64)),
            "tile_bytes": tile_bytes,
        })

    ds = read_images(fixture_dir, columns=["bytes", "phash"])
    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")
    return keyed_ds.groupby("bucket").map_groups(combine, batch_format="pyarrow")
