"""The headline pipeline: spatial PIP join + tile assignment in one pass.

One streaming pass over the image corpus: skinny read (no payload bytes)
-> derive geometry -> encode curve keys -> broadcast PIP join -> tile id
derived from the same cell key (prefix shift — no second encode). Output
rows are (image_id, region_id, level, tile): every join row carries its
tile assignment, which is the north-star metric's unit of work.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from geomesa_ray.pipelines.pip_join import pip_join
from geomesa_ray.stages.encode import DEFAULT_CELL_LEVEL


def flagship(fixture_dir: str, tile_level: int = 8,
             cell_level: int = DEFAULT_CELL_LEVEL,
             concurrency=None) -> ray.data.Dataset:
    shift = 2 * (cell_level - tile_level)

    ds = pip_join(fixture_dir, cell_level=cell_level,
                  emit_cols=("image_id", "cell"), concurrency=concurrency)

    def add_tile(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False)
        n = batch.num_rows
        return pa.table({
            "image_id": batch.column("image_id"),
            "region_id": batch.column("region_id"),
            "level": pa.array(np.full(n, tile_level, dtype=np.int64)),
            "tile": pa.array(cell >> np.int64(shift)),
        })

    return ds.map_batches(add_tile, batch_format="pyarrow")
