"""Fixture determinism + payload invariant tests (FIXTURES.md F1-F3)."""

import numpy as np
import pyarrow.parquet as pq

from geomesa_ray.sources.fixtures import (
    DTG_BASE_S,
    DTG_SPAN_S,
    IMG_NBYTES,
    gen_images_table,
    gen_probes_table,
    gen_regions_table,
    splitmix64,
)
from geomesa_ray.stages.derive import phash_to_dtg_s, phash_to_lonlat


class TestImagesFixture:
    def test_schema_matches_input_hint(self):
        t = gen_images_table(100)
        assert t.schema.names == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
        assert str(t.schema.field("image_id").type) == "string"
        assert str(t.schema.field("bytes").type) == "binary"
        assert str(t.schema.field("w").type) == "int32"
        assert str(t.schema.field("h").type) == "int32"
        assert str(t.schema.field("phash").type) == "int64"

    def test_deterministic(self):
        a = gen_images_table(500)
        b = gen_images_table(500)
        assert a.equals(b)

    def test_bytes_decode(self):
        t = gen_images_table(10)
        row = t.slice(3, 1).to_pydict()
        pixels = np.frombuffer(row["bytes"][0], dtype=np.uint8)
        assert pixels.shape == (IMG_NBYTES,)
        assert pixels.reshape(8, 8, 3).shape == (8, 8, 3)

    def test_derived_geometry_in_bounds(self):
        t = gen_images_table(5000)
        phash = t.column("phash").to_numpy()
        lon, lat = phash_to_lonlat(phash)
        assert lon.min() >= -180 and lon.max() < 180
        assert lat.min() >= -90 and lat.max() < 90
        dtg = phash_to_dtg_s(phash)
        assert dtg.min() >= DTG_BASE_S and dtg.max() < DTG_BASE_S + DTG_SPAN_S
        # spans >= 4 distinct epoch weeks (week-boundary logic exercised)
        weeks = np.unique(dtg // 604800)
        assert len(weeks) >= 4

    def test_splitmix_known_vector(self):
        # splitmix64(0) with the standard constants
        assert int(splitmix64(np.uint64(0))) == 0xE220A8397B1DCDAF


class TestRegionsProbes:
    def test_regions_kinds(self):
        t = gen_regions_table()
        kinds = set(t.column("kind").to_pylist())
        assert kinds == {"box", "poly"}
        ids = t.column("region_id").to_pylist()
        assert "r_idl" in ids and "r_world" in ids and "r_tiny" in ids

    def test_probes(self):
        t = gen_probes_table()
        assert t.num_rows == 64
        assert set(t.column("k").to_pylist()) == {1, 5, 10}


class TestEnsure:
    def test_ensure_idempotent(self, tiny_fixtures):
        import os

        assert os.path.exists(os.path.join(tiny_fixtures, "images.parquet"))
        t = pq.read_table(os.path.join(tiny_fixtures, "images.parquet"))
        assert t.num_rows == 6000
        assert t.equals(gen_images_table(6000))
