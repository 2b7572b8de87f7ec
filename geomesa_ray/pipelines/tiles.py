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


CHUNK_PX = 8                        # fixture chunks are 8x8 RGB
# native ground resolution per chunk pixel: a chunk footprint is 1/8 of
# a level-8 tile (8 px x this res), so canvases composite several chunks
# and a chunk paints a bounded ~(footprint/canvas-cell)^2 pixel window
CHUNK_RES_DEG = 360.0 / (256 * 64)


def mosaic(fixture_dir: str, level: int = DEFAULT_TILE_LEVEL,
           canvas: int = 32,
           res_deg: float = CHUNK_RES_DEG) -> ray.data.Dataset:
    """Per-tile mosaic by TRUE CANVAS COMPOSITION — the reference's
    ``RasterUtils.mosaicChunks`` semantics
    (``geomesa-raster/.../util/RasterUtils.scala:101-162``): each member
    chunk is positioned onto the tile's canvas at its georeferenced
    OFFSET and SCALED from its native resolution to the canvas
    resolution (nearest-neighbor, the integer-exact analog of the
    reference's Graphics2D scaling), cropped to the tile extent. Chunks
    draw in image_id order (a deterministic stand-in for the
    reference's chunk iteration order) — later chunks overwrite where
    footprints overlap, exactly like drawImage onto the shared canvas.

    Data model: a chunk's footprint is an ``8 x 8`` pixel square of
    ``res_deg`` degrees per pixel centered on its georeferenced point;
    a chunk is drawn into EVERY tile its footprint intersects (the
    keyed explosion below), so tile seams are consistent.

    Shape: tiles are SPARSE relative to rows, so the raw payload
    shuffles ONCE keyed by a tile-prefix bucket (the honest co-location
    cost of mosaicking); each bucket composes all its tiles' canvases.
    Returns (level, tile, n_images, tile_bytes) with
    ``canvas x canvas x 3`` uint8 canvases.
    """
    n = 1 << level
    tw = 360.0 / n
    th = 180.0 / n
    half = (CHUNK_PX / 2.0) * res_deg
    bucket_level = max(level - 4, 0)  # 4^4 = 256 tiles per bucket group
    shift = 2 * (level - bucket_level)
    nb = canvas * canvas * 3

    from geomesa_ray.curve.zorder import z2_encode

    def keyed(batch: pa.Table) -> pa.Table:
        b = derive_and_encode(batch, cell_level=level)
        lon = b.column("lon").to_numpy(zero_copy_only=False)
        lat = b.column("lat").to_numpy(zero_copy_only=False)
        # tile index ranges the footprint touches: lon WRAPS at the
        # antimeridian (a chunk straddling ±180 paints both sides —
        # consistent seams), lat clips at the poles
        ix0 = np.floor((lon - half + 180.0) / tw).astype(np.int64)
        ix1 = np.floor((lon + half + 180.0) / tw).astype(np.int64)
        iy0 = np.clip(np.floor((lat - half + 90.0) / th).astype(np.int64),
                      0, n - 1)
        iy1 = np.clip(np.floor((lat + half + 90.0) / th).astype(np.int64),
                      0, n - 1)
        span = ((ix1 - ix0 + 1) * (iy1 - iy0 + 1)).astype(np.int64)
        rep = np.repeat(np.arange(len(lon), dtype=np.int64), span)
        # per-copy (tx, ty) via a vectorized within-footprint counter
        offs = np.concatenate([[0], np.cumsum(span)])
        local = np.arange(len(rep), dtype=np.int64) - offs[rep]
        ncols = (ix1 - ix0 + 1)[rep]
        tx_raw = ix0[rep] + (local % ncols)
        wrap = np.floor_divide(tx_raw, n)  # -1/0/+1 world copies
        tx = tx_raw - wrap * n
        ty = iy0[rep] + (local // ncols)
        # the chunk's lon SHIFTED into the wrapped tile's frame, so the
        # canvas sampling below works in plain planar coordinates
        lon_emit = lon[rep] - wrap * 360.0
        tile = z2_encode(tx.astype(np.uint64),
                         ty.astype(np.uint64)).view(np.int64)
        ids = b.column("image_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        byt = b.column("bytes")
        if isinstance(byt, pa.ChunkedArray):
            byt = byt.combine_chunks()
        take = pa.array(rep)
        return pa.table({
            "tile": pa.array(tile),
            "bucket": pa.array(tile >> np.int64(shift)),
            "tx": pa.array(tx),
            "ty": pa.array(ty),
            "image_id": ids.take(take),
            "bytes": byt.take(take),
            "lon": pa.array(lon_emit),
            "lat": pa.array(lat[rep]),
        })

    # candidate window: canvas rows/cols a footprint can cover (+slack
    # for the floor/center rounding) — the exact per-candidate validity
    # mask below discards the slack, so the window only bounds work
    cell_w, cell_h = tw / canvas, th / canvas
    kr = int(np.ceil(CHUNK_PX * res_deg / cell_h)) + 3
    kc = int(np.ceil(CHUNK_PX * res_deg / cell_w)) + 3

    def compose(group: pa.Table) -> pa.Table:
        """Fully vectorized canvas composition: every (member-copy,
        canvas-pixel) candidate is generated in one broadcast pass, then
        draw-order overwrite resolves as LAST-WRITER-WINS via one
        lexsort over (tile, r, c, draw-rank) — no per-member Python
        draw loop (measured 10.2 s -> vectorized at sf0.1)."""
        from geomesa_ray.util import binary_column_to_matrix

        tile = group.column("tile").to_numpy(zero_copy_only=False)
        txs = group.column("tx").to_numpy(zero_copy_only=False)
        tys = group.column("ty").to_numpy(zero_copy_only=False)
        lon = group.column("lon").to_numpy(zero_copy_only=False)
        lat = group.column("lat").to_numpy(zero_copy_only=False)
        ids = np.asarray(group.column("image_id").to_pylist(), dtype=object)
        px = binary_column_to_matrix(
            group.column("bytes"), CHUNK_PX * CHUNK_PX * 3
        ).reshape(-1, CHUNK_PX, CHUNK_PX, 3)
        uniq, tile_idx, cnt = np.unique(tile, return_inverse=True,
                                        return_counts=True)
        _, rank = np.unique(ids, return_inverse=True)  # draw order by id
        canvases = np.zeros((len(uniq), canvas, canvas, 3), dtype=np.uint8)

        out_key, out_rank, out_rgb = [], [], []
        B = 65536  # copy-block bound: (B x kr x kc) candidate arrays
        for s in range(0, len(tile), B):
            e = min(s + B, len(tile))
            tx0 = -180.0 + txs[s:e].astype(np.float64) * tw
            ty1 = -90.0 + (tys[s:e].astype(np.float64) + 1.0) * th
            x0m = lon[s:e] - half
            y1m = lat[s:e] + half
            # first canvas row/col the footprint might touch
            r0 = np.floor((ty1 - y1m) / cell_h - 0.5).astype(np.int64) - 1
            c0 = np.floor((x0m - tx0) / cell_w - 0.5).astype(np.int64) - 1
            rr = r0[:, None] + np.arange(kr)[None, :]            # (B, kr)
            cc = c0[:, None] + np.arange(kc)[None, :]            # (B, kc)
            y = ty1[:, None] - (rr + 0.5) * cell_h
            x = tx0[:, None] + (cc + 0.5) * cell_w
            sr = np.floor((y1m[:, None] - y) / res_deg).astype(np.int64)
            sc = np.floor((x - x0m[:, None]) / res_deg).astype(np.int64)
            okr = (rr >= 0) & (rr < canvas) & (sr >= 0) & (sr < CHUNK_PX)
            okc = (cc >= 0) & (cc < canvas) & (sc >= 0) & (sc < CHUNK_PX)
            ok = okr[:, :, None] & okc[:, None, :]               # (B,kr,kc)
            ci, ri, cj = np.nonzero(ok)
            if len(ci) == 0:
                continue
            g = ci + s
            rv, cv = rr[ci, ri], cc[ci, cj]
            out_key.append((tile_idx[g].astype(np.int64) * canvas + rv)
                           * canvas + cv)
            out_rank.append(rank[g])
            out_rgb.append(px[g, sr[ci, ri], sc[ci, cj]])
        if out_key:
            key = np.concatenate(out_key)
            rk = np.concatenate(out_rank)
            rgb = np.concatenate(out_rgb)
            order = np.lexsort((rk, key))
            key, rgb = key[order], rgb[order]
            last = np.append(key[1:] != key[:-1], True)  # last writer wins
            key, rgb = key[last], rgb[last]
            ti, rem = key // (canvas * canvas), key % (canvas * canvas)
            canvases[ti, rem // canvas, rem % canvas] = rgb
        cnt = cnt.astype(np.int64)
        offsets = pa.array(np.arange(len(uniq) + 1, dtype=np.int32) * nb)
        tile_bytes = pa.BinaryArray.from_buffers(
            pa.binary(), len(uniq),
            [None, offsets.buffers()[1],
             pa.py_buffer(np.ascontiguousarray(canvases).tobytes())])
        return pa.table({
            "level": pa.array(np.full(len(uniq), level, dtype=np.int64)),
            "tile": pa.array(uniq),
            "n_images": pa.array(cnt),
            "tile_bytes": tile_bytes,
        })

    ds = read_images(fixture_dir, columns=["image_id", "bytes", "phash"])
    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")
    return keyed_ds.groupby("bucket").map_groups(compose,
                                                 batch_format="pyarrow")
