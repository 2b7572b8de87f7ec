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

    Vectorized segmented reduction: each batch sorts by tile and
    ``np.add.reduceat``s the stacked pixel matrix into per-tile partial
    sums (one row per tile per batch); a single combine merges partials
    and finalizes mean canvases. (A groupby(tile).map_groups formulation
    pays the per-group UDF call ~39k times at level 8 — 6+ s of pure
    overhead; this shape is ~6x faster with identical output. For tile
    counts beyond one combine task, swap the final stage for
    groupby(tile) over the partial sums.)
    """
    nb = w * h * 3

    def partial(batch: pa.Table) -> pa.Table:
        from geomesa_ray.util import binary_column_to_matrix

        b = derive_and_encode(batch, cell_level=level)
        cell = b.column("cell").to_numpy(zero_copy_only=False)
        px = binary_column_to_matrix(b.column("bytes"), nb).astype(np.float64)
        order = np.argsort(cell, kind="stable")
        cell_s = cell[order]
        uniq, start = np.unique(cell_s, return_index=True)
        sums = np.ascontiguousarray(np.add.reduceat(px[order], start, axis=0))
        counts = np.diff(np.append(start, len(cell_s)))
        offsets = pa.array(np.arange(len(uniq) + 1, dtype=np.int32) * (nb * 8))
        pixsum = pa.BinaryArray.from_buffers(
            pa.binary(), len(uniq),
            [None, offsets.buffers()[1], pa.py_buffer(sums.tobytes())])
        return pa.table({
            "tile": pa.array(uniq),
            "n": pa.array(counts.astype(np.int64)),
            "pixsum": pixsum,
        })

    def final(batch: pa.Table) -> pa.Table:
        from geomesa_ray.util import binary_column_to_matrix

        tile = batch.column("tile").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        sums = binary_column_to_matrix(batch.column("pixsum"), nb * 8) \
            .view(np.float64).reshape(len(tile), nb)
        order = np.argsort(tile, kind="stable")
        tile_s, n_s, sums_s = tile[order], n[order], sums[order]
        uniq, start = np.unique(tile_s, return_index=True)
        tot = np.add.reduceat(sums_s, start, axis=0)
        cnt = np.add.reduceat(n_s, start)
        canvases = np.round(tot / cnt[:, None]).astype(np.uint8)
        flat = canvases.reshape(-1)
        offsets = pa.array(np.arange(len(uniq) + 1, dtype=np.int32) * nb)
        tile_bytes = pa.BinaryArray.from_buffers(
            pa.binary(), len(uniq),
            [None, offsets.buffers()[1], pa.py_buffer(flat.tobytes())])
        return pa.table({
            "level": pa.array(np.full(len(uniq), level, dtype=np.int64)),
            "tile": pa.array(uniq),
            "n_images": pa.array(cnt.astype(np.int64)),
            "tile_bytes": tile_bytes,
        })

    from geomesa_ray.util import gather_combine

    ds = read_images(fixture_dir, columns=["image_id", "bytes", "phash"])
    parts = ds.map_batches(partial, batch_format="pyarrow")
    return gather_combine(parts, final)
