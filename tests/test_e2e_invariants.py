"""End-to-end payload invariants (SURVEY §5 adopt-list d, FIXTURES.md F4):
pixels PSNR >= 40 dB (byte-identical here) and captions byte-equal through
every stage of a composed pipeline; mosaic pixels vs a numpy oracle."""

import numpy as np
import pyarrow.parquet as pq

from geomesa_ray.pipelines.tiles import mosaic, select_level
from geomesa_ray.sources.fixtures import gen_images_table
from geomesa_ray.stages.image_ops import psnr


class TestMosaicOracle:
    def _canvas_oracle(self, level, canvas, res_deg):
        """Independent SCALAR re-implementation of mosaicChunks canvas
        composition: per tile, walk members in image_id order, draw each
        chunk pixel-by-pixel at its georeferenced offset + scale."""
        from geomesa_ray.stages.derive import phash_to_lonlat

        ref = gen_images_table(6000)
        lon, lat = phash_to_lonlat(ref.column("phash").to_numpy())
        ids = ref.column("image_id").to_pylist()
        bufs = [np.frombuffer(b, np.uint8).reshape(8, 8, 3)
                for b in ref.column("bytes").to_pylist()]
        n = 1 << level
        tw, th = 360.0 / n, 180.0 / n
        half = 4.0 * res_deg
        tiles = {}
        from geomesa_ray.curve.zorder import z2_encode

        for i in range(len(ids)):
            ix0 = int(np.floor((lon[i] - half + 180.0) / tw))
            ix1 = int(np.floor((lon[i] + half + 180.0) / tw))
            iy0 = int(np.clip(np.floor((lat[i] - half + 90.0) / th),
                              0, n - 1))
            iy1 = int(np.clip(np.floor((lat[i] + half + 90.0) / th),
                              0, n - 1))
            for ty in range(iy0, iy1 + 1):
                for tx_raw in range(ix0, ix1 + 1):
                    wrap = tx_raw // n  # lon wraps at the antimeridian
                    tx = tx_raw - wrap * n
                    tz = int(z2_encode(np.uint64(tx), np.uint64(ty)))
                    tiles.setdefault(tz, []).append((i, wrap))
        out = {}
        for tz, members in tiles.items():
            members = sorted(members, key=lambda m: ids[m[0]])
            from geomesa_ray.curve.zorder import z2_decode

            tx, ty = z2_decode(np.uint64(tz))
            tx0 = -180.0 + float(tx) * tw
            ty1 = -90.0 + (float(ty) + 1.0) * th
            cv = np.zeros((canvas, canvas, 3), np.uint8)
            for i, wrap in members:
                li = lon[i] - wrap * 360.0  # shift into the tile's frame
                for r in range(canvas):
                    y = ty1 - (r + 0.5) * (th / canvas)
                    sr = int(np.floor((lat[i] + half - y) / res_deg))
                    if not 0 <= sr < 8:
                        continue
                    for c in range(canvas):
                        x = tx0 + (c + 0.5) * (tw / canvas)
                        sc = int(np.floor((x - (li - half)) / res_deg))
                        if 0 <= sc < 8:
                            cv[r, c] = bufs[i][sr, sc]
            out[tz] = (len(members), cv)
        return out

    def test_tile_pixels_match_canvas_oracle(self, ray_session,
                                             tiny_fixtures):
        level, canvas = 8, 32
        from geomesa_ray.pipelines.tiles import CHUNK_RES_DEG

        rows = mosaic(tiny_fixtures, level=level, canvas=canvas).take_all()
        want = self._canvas_oracle(level, canvas, CHUNK_RES_DEG)
        assert {r["tile"] for r in rows} == set(want)
        checked = drew = 0
        for r in rows[:200]:
            n_img, cv = want[r["tile"]]
            assert r["n_images"] == n_img
            got = np.frombuffer(r["tile_bytes"], np.uint8)
            assert psnr(got, cv.ravel()) == float("inf")
            if cv.any():
                drew += 1
            checked += 1
        assert checked == 200 and drew > 100  # canvases genuinely drawn

    def test_select_level(self):
        assert select_level([2, 4, 8], 6) == 4
        assert select_level([2, 4, 8], 8) == 8
        assert select_level([4, 8], 2) == 4  # nothing <= requested -> min


class TestComposedPipelineInvariants:
    def test_ingest_store_query_export_bytes(self, ray_session, tiny_fixtures,
                                             tmp_path):
        """ingest -> salted store -> pruned spatial query -> payload
        re-join -> every byte intact."""
        from geomesa_ray.pipelines.scan import SpatialQuery
        from geomesa_ray.state.store import read_store, write_store

        store = str(tmp_path / "store")
        write_store(tiny_fixtures, store,
                    columns=["image_id", "phash", "caption", "bytes",
                             "w", "h", "fmt"],
                    hot_rows_threshold=200, n_salt=4)
        q = SpatialQuery(-60.0, 60.0, -60.0, 60.0)
        rows = read_store(store, q).select_columns(
            ["image_id", "caption", "bytes"]).take_all()
        assert len(rows) > 300
        ref = gen_images_table(6000)
        cap = dict(zip(ref.column("image_id").to_pylist(),
                       ref.column("caption").to_pylist()))
        pix = dict(zip(ref.column("image_id").to_pylist(),
                       ref.column("bytes").to_pylist()))
        for r in rows:
            assert r["caption"] == cap[r["image_id"]], "caption corrupted"
            a = np.frombuffer(pix[r["image_id"]], np.uint8)
            b = np.frombuffer(r["bytes"], np.uint8)
            assert psnr(a, b) == float("inf"), "pixels corrupted"
