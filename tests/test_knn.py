"""kNN tests: haversine variant vs brute-force oracle; indexed (ring
expansion over the store) variant vs the full-scan planar pipeline."""

import numpy as np
import pyarrow.parquet as pq

from geomesa_ray.geom.kernels import haversine_m
from geomesa_ray.pipelines.knn import knn, knn_indexed
from geomesa_ray.sources.fixtures import gen_images_table
from geomesa_ray.stages.derive import phash_to_lonlat


def knn_rows(ds_or_table):
    rows = ds_or_table.take_all() if hasattr(ds_or_table, "take_all") else \
        ds_or_table.to_pylist()
    return {(r["probe_id"], r["knn_rank"]): r["image_id"] for r in rows}


class TestHaversineKnn:
    def test_vs_bruteforce(self, ray_session, tiny_fixtures):
        got = knn_rows(knn(tiny_fixtures, metric="haversine"))
        probes = pq.read_table(f"{tiny_fixtures}/probes.parquet")
        t = gen_images_table(6000)
        lon, lat = phash_to_lonlat(t.column("phash").to_numpy())
        ids = np.asarray(t.column("image_id").to_pylist(), dtype=object)
        for p in probes.to_pylist():
            d = haversine_m(lon, lat, p["lon"], p["lat"])
            order = np.lexsort((ids, d))[: p["k"]]
            for r, i in enumerate(order, 1):
                assert got[(p["probe_id"], r)] == ids[i], \
                    f"probe {p['probe_id']} rank {r}"


class TestIndexedKnn:
    def test_matches_full_scan(self, ray_session, tiny_fixtures, tmp_path):
        from geomesa_ray.state.store import write_store

        store = str(tmp_path / "store")
        write_store(tiny_fixtures, store)
        got = knn_rows(knn_indexed(store, fixture_dir=tiny_fixtures))
        want = knn_rows(knn(tiny_fixtures, metric="planar"))
        assert got == want

    def test_prunes_reads_for_clustered_probes(self, ray_session, tiny_fixtures,
                                               tmp_path):
        """A single probe with small k must not read every partition."""
        import pyarrow as pa

        from geomesa_ray.state.store import write_store

        store = str(tmp_path / "store")
        write_store(tiny_fixtures, store)
        probes = pa.table({
            "probe_id": pa.array(["p0"]), "lon": pa.array([10.0]),
            "lat": pa.array([45.0]), "k": pa.array([3], pa.int32()),
            "max_dist_m": pa.array([1e7]),
        })
        # instrument: count partition reads via the distributed reader
        import geomesa_ray.pipelines.knn as knn_mod

        calls = []
        orig = knn_mod.ray.data.read_parquet

        def spy(paths, **kw):
            calls.append(len(paths) if isinstance(paths, list) else 1)
            return orig(paths, **kw)

        knn_mod.ray.data.read_parquet = spy
        try:
            out = knn_indexed(store, probes=probes)
        finally:
            knn_mod.ray.data.read_parquet = orig
        assert len(out) == 3
        assert 0 < sum(calls) < 40, f"read {sum(calls)} partitions of 64"


class TestIndexedKnnManyProbes:
    def test_thousand_probes_match_full_scan(self, ray_session, tiny_fixtures,
                                             tmp_path):
        """10^3 probes through the distributed ring reader — exact match
        with the full-scan pipeline, partitions never driver-loaded."""
        import pyarrow as pa

        from geomesa_ray.state.store import write_store

        store = str(tmp_path / "store1k")
        write_store(tiny_fixtures, store)
        rng = np.random.default_rng(7)
        n = 1000
        probes = pa.table({
            "probe_id": pa.array([f"q{i:04d}" for i in range(n)]),
            "lon": pa.array(rng.uniform(-179.0, 179.0, n)),
            "lat": pa.array(rng.uniform(-85.0, 85.0, n)),
            "k": pa.array(rng.integers(1, 6, n), pa.int32()),
            "max_dist_m": pa.array(np.full(n, 1e7)),
        })
        got = knn_rows(knn_indexed(store, probes=probes))
        want = knn_rows(knn(tiny_fixtures, probes=probes, metric="planar"))
        assert got == want


class TestIndexedHaversine:
    def test_matches_full_scan_haversine(self, ray_session, tiny_fixtures,
                                         tmp_path):
        from geomesa_ray.state.store import write_store

        store = str(tmp_path / "hstore")
        write_store(tiny_fixtures, store)
        got = knn_rows(knn_indexed(store, fixture_dir=tiny_fixtures,
                                   metric="haversine"))
        want = knn_rows(knn(tiny_fixtures, metric="haversine"))
        assert got == want  # includes polar + near-IDL probes (fixture F3)


class TestPolarTermination:
    def test_high_latitude_probe_matches_full_scan(self, ray_session,
                                                   tiny_fixtures, tmp_path):
        """A probe whose rings reach the pole has NO valid longitude
        lower bound (short paths over the pole): termination must wait
        for full lon wrap, not fall back to the latitude-only bound."""
        import pyarrow as pa

        from geomesa_ray.state.store import write_store

        store = str(tmp_path / "polar")
        write_store(tiny_fixtures, store)
        probes = pa.table({
            "probe_id": pa.array([f"hp{i}" for i in range(6)]),
            "lon": pa.array([0.0, 90.0, -90.0, 180.0 - 1e-6, 45.0, -135.0]),
            "lat": pa.array([85.0, 87.0, -86.0, 84.0, 89.0, -88.5]),
            "k": pa.array([5, 3, 8, 5, 10, 2], pa.int32()),
            "max_dist_m": pa.array([1e7] * 6),
        })
        got = knn_rows(knn_indexed(store, probes=probes, metric="haversine"))
        want = knn_rows(knn(tiny_fixtures, probes=probes, metric="haversine"))
        assert got == want


class TestProbeWaves:
    def test_wave_split_matches_single_wave(self, ray_session, tiny_fixtures,
                                            tmp_path):
        """Forcing a tiny wave size must produce the identical result set
        (waves only bound memory, never change semantics)."""
        import pyarrow as pa

        from geomesa_ray.state.store import write_store

        store = str(tmp_path / "waves")
        write_store(tiny_fixtures, store)
        probes = pq.read_table(f"{tiny_fixtures}/probes.parquet")
        one = knn_rows(knn_indexed(store, probes=probes))
        waved = knn_rows(knn_indexed(store, probes=probes,
                                     probe_wave_size=7))
        assert waved == one


class TestMergeRoute:
    def test_single_task_and_groupby_merges_agree(self, ray_session,
                                                  tiny_fixtures,
                                                  tmp_path):
        """The bounded single-task merge (small waves) and the
        probe-bucketed groupby merge must produce the identical result
        set — only the exchange shape differs."""
        import pyarrow as pa

        from geomesa_ray.state.store import write_store

        store = str(tmp_path / "mroute")
        write_store(tiny_fixtures, store)
        rng = np.random.default_rng(3)
        n = 300
        probes = pa.table({
            "probe_id": pa.array([f"m{i:03d}" for i in range(n)]),
            "lon": pa.array(rng.uniform(-170.0, 170.0, n)),
            "lat": pa.array(rng.uniform(-80.0, 80.0, n)),
            "k": pa.array(rng.integers(1, 6, n), pa.int32()),
            "max_dist_m": pa.array(np.full(n, 1e7)),
        })
        single = knn_rows(knn_indexed(store, probes=probes))
        grouped = knn_rows(knn_indexed(store, probes=probes,
                                       merge_gather_threshold=0))
        assert single == grouped
