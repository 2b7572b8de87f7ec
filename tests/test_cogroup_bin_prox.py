"""Co-partitioned PIP join (with forced salting), BIN export byte layout,
proximity join — each vs independent oracles."""

import numpy as np
import pyarrow.parquet as pq

from geomesa_ray.pipelines.pip_cogroup import pip_join_cogroup
from geomesa_ray.sources.fixtures import gen_images_table
from geomesa_ray.stages.derive import phash_to_dtg_s, phash_to_lonlat
from tests.test_pip_join import brute_force_pairs


class TestCogroupJoin:
    def test_matches_broadcast_and_oracle(self, ray_session, tiny_fixtures):
        regions = pq.read_table(f"{tiny_fixtures}/regions.parquet")
        want = brute_force_pairs(6000, regions)
        # hot_threshold=10 forces salting on nearly every occupied cell
        ds = pip_join_cogroup(tiny_fixtures, regions, hot_threshold=10, n_salt=4)
        got = set()
        for b in ds.iter_batches(batch_format="pyarrow"):
            got.update(zip(b.column("image_id").to_pylist(),
                           b.column("region_id").to_pylist()))
        assert got == want, (f"missing={list(want - got)[:5]} "
                             f"extra={list(got - want)[:5]}")

    def test_no_duplicate_pairs_under_salting(self, ray_session, tiny_fixtures):
        regions = pq.read_table(f"{tiny_fixtures}/regions.parquet")
        ds = pip_join_cogroup(tiny_fixtures, regions, hot_threshold=1, n_salt=8)
        pairs = []
        for b in ds.iter_batches(batch_format="pyarrow"):
            pairs.extend(zip(b.column("image_id").to_pylist(),
                             b.column("region_id").to_pylist()))
        assert len(pairs) == len(set(pairs))


class TestBinExport:
    def test_byte_layout(self):
        from geomesa_ray.stages.bin_export import pack_bin, unpack_bin

        track = np.array([7, 9], dtype=np.int64)
        secs = np.array([100, 50], dtype=np.int64)
        lat = np.array([1.5, -2.5])
        lon = np.array([3.25, 4.75])
        buf = pack_bin(track, secs, lat, lon, sort_by_time=True)
        assert len(buf) == 32  # 2 x 16 B
        rec = unpack_bin(buf)
        # sorted by time: secs 50 first
        assert rec["secs"].tolist() == [50, 100]
        assert rec["track"].tolist() == [9, 7]
        assert rec["lat"].dtype == np.float32
        # exact little-endian layout of the first record
        import struct

        t, s, la, lo = struct.unpack("<iiff", buf[:16])
        assert (t, s) == (9, 50) and abs(la - (-2.5)) < 1e-6

    def test_labeled_24_bytes(self):
        from geomesa_ray.stages.bin_export import pack_bin, unpack_bin

        buf = pack_bin(np.array([1]), np.array([2]), np.array([3.0]),
                       np.array([4.0]), label=np.array([99]))
        assert len(buf) == 24
        assert unpack_bin(buf, labeled=True)["label"].tolist() == [99]

    def test_pipeline(self, ray_session, tiny_fixtures):
        from geomesa_ray.stages.bin_export import bin_export, unpack_bin

        rows = bin_export(tiny_fixtures).take_all()
        assert sum(r["n_records"] for r in rows) == 6000
        rec = unpack_bin(rows[0]["bin_bytes"])
        assert (np.diff(rec["secs"]) >= 0).all()  # in-chunk time sort


class TestProximity:
    def test_matches_bruteforce(self, ray_session, tiny_fixtures):
        from geomesa_ray.geom.kernels import haversine_m
        from geomesa_ray.pipelines.proximity import proximity_join

        plon = np.array([10.0, -120.0])
        plat = np.array([45.0, -30.0])
        ds = proximity_join(tiny_fixtures, plon, plat, ["a", "b"], 300_000.0)
        got = set()
        for b in ds.iter_batches(batch_format="pyarrow"):
            got.update(zip(b.column("probe_id").to_pylist(),
                           b.column("image_id").to_pylist()))
        t = gen_images_table(6000)
        lon, lat = phash_to_lonlat(t.column("phash").to_numpy())
        ids = t.column("image_id").to_pylist()
        want = set()
        for p, pid in enumerate(["a", "b"]):
            d = haversine_m(lon, lat, plon[p], plat[p])
            for i in np.nonzero(d <= 300_000.0)[0]:
                want.add((pid, ids[i]))
        assert got == want

    def test_unique_union(self, ray_session, tiny_fixtures):
        import ray.data

        from geomesa_ray.pipelines.proximity import unique_union

        import pyarrow as pa

        a = ray.data.from_arrow(pa.table({"image_id": pa.array(["x", "y"])}))
        b = ray.data.from_arrow(pa.table({"image_id": pa.array(["y", "z"])}))
        got = sorted(r["image_id"] for r in unique_union([a, b]).take_all())
        assert got == ["x", "y", "z"]


class TestProximityIDL:
    def test_cross_antimeridian_pairs_found(self, ray_session, tiny_fixtures):
        """Regression: the lon prescreen must wrap at the date line."""
        from geomesa_ray.geom.kernels import haversine_m
        from geomesa_ray.pipelines.proximity import proximity_join

        plon = np.array([179.8])
        plat = np.array([0.0])
        ds = proximity_join(tiny_fixtures, plon, plat, ["idl"], 500_000.0)
        got = {r["image_id"] for r in ds.take_all()}
        t = gen_images_table(6000)
        lon, lat = phash_to_lonlat(t.column("phash").to_numpy())
        d = haversine_m(lon, lat, 179.8, 0.0)
        want = {t.column("image_id")[i].as_py()
                for i in np.nonzero(d <= 500_000.0)[0]}
        assert got == want
        # at least one match must come from the west side of the line
        west = [i for i in np.nonzero(d <= 500_000.0)[0] if lon[i] < 0]
        assert west, "fixture should have a west-side neighbor for this probe"

    def test_polar_and_wide_circle_coverage(self, ray_session, tiny_fixtures):
        """Regression: the lon prescreen must not under-cover — circles
        near poles and mid-lat circles wider than the linear lon bound."""
        from geomesa_ray.geom.kernels import haversine_m
        from geomesa_ray.pipelines.proximity import proximity_join

        plon = np.array([10.0, 0.0, -45.0])
        plat = np.array([45.0, 87.0, -86.0])
        dist = 600_000.0
        ds = proximity_join(tiny_fixtures, plon, plat, ["m", "n", "s"], dist)
        got = {(r["probe_id"], r["image_id"]) for r in ds.take_all()}
        t = gen_images_table(6000)
        lon, lat = phash_to_lonlat(t.column("phash").to_numpy())
        ids = t.column("image_id").to_pylist()
        want = set()
        for p, pid in enumerate(["m", "n", "s"]):
            d = haversine_m(lon, lat, plon[p], plat[p])
            for i in np.nonzero(d <= dist)[0]:
                want.add((pid, ids[i]))
        assert got == want, f"missing={list(want - got)[:5]}"
