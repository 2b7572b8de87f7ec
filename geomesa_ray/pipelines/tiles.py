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
    member count. The groupby(tile) shuffle is the only wide op."""

    def keyed(batch: pa.Table) -> pa.Table:
        b = derive_and_encode(batch, cell_level=level)
        return b.select(["image_id", "bytes", "cell"])

    def combine(group: pa.Table) -> pa.Table:
        bufs = group.column("bytes").to_pylist()
        px = np.stack([np.frombuffer(b, dtype=np.uint8) for b in bufs])
        canvas = px.mean(axis=0).round().astype(np.uint8)
        return pa.table({
            "level": pa.array([level], type=pa.int64()),
            "tile": pa.array([group.column("cell")[0].as_py()], type=pa.int64()),
            "n_images": pa.array([group.num_rows], type=pa.int64()),
            "tile_bytes": pa.array([canvas.tobytes()], type=pa.binary()),
        })

    ds = read_images(fixture_dir, columns=["image_id", "bytes", "phash"])
    ds = ds.map_batches(keyed, batch_format="pyarrow")
    return ds.groupby("cell").map_groups(combine, batch_format="pyarrow")
