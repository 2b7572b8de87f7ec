"""End-to-end payload invariants (SURVEY §5 adopt-list d, FIXTURES.md F4):
pixels PSNR >= 40 dB (byte-identical here) and captions byte-equal through
every stage of a composed pipeline; mosaic pixels vs a numpy oracle."""

import numpy as np
import pyarrow.parquet as pq

from geomesa_ray.pipelines.tiles import mosaic, select_level
from geomesa_ray.sources.fixtures import gen_images_table
from geomesa_ray.stages.image_ops import psnr


class TestMosaicOracle:
    def test_tile_pixels_match_mean_oracle(self, ray_session, tiny_fixtures):
        from geomesa_ray.curve.sfc import Z2Grid
        from geomesa_ray.stages.derive import phash_to_lonlat

        rows = mosaic(tiny_fixtures, level=4).take_all()
        ref = gen_images_table(6000)
        lon, lat = phash_to_lonlat(ref.column("phash").to_numpy())
        cells = np.asarray(Z2Grid(4).encode(lon, lat))
        bufs = ref.column("bytes").to_pylist()
        checked = 0
        for r in rows[:20]:
            members = np.nonzero(cells == r["tile"])[0]
            assert len(members) == r["n_images"]
            px = np.stack([np.frombuffer(bufs[i], np.uint8) for i in members])
            want = px.mean(axis=0).round().astype(np.uint8)
            got = np.frombuffer(r["tile_bytes"], np.uint8)
            assert psnr(got, want) == float("inf")
            checked += 1
        assert checked == 20

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
