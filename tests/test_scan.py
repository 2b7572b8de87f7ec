"""Range-scan pipeline vs brute-force oracle (reference Z3IdxStrategyTest
role: bbox+interval queries with exact row-set assertions)."""

import numpy as np

from geomesa_ray.pipelines.scan import (
    SpatialQuery,
    coarse_mask,
    exact_mask,
    plan_query,
    scan,
)
from geomesa_ray.sources.fixtures import DTG_BASE_S, gen_images_table
from geomesa_ray.stages.encode import derive_and_encode


def brute_force_ids(n, q: SpatialQuery):
    t = derive_and_encode(gen_images_table(n))
    lon = t.column("lon").to_numpy()
    lat = t.column("lat").to_numpy()
    dtg = t.column("dtg_s").to_numpy()
    m = exact_mask(q, lon, lat, dtg)
    return set(np.array(t.column("image_id").to_pylist())[m].tolist()), t


QUERIES = [
    SpatialQuery(-10.0, 25.0, -5.0, 30.0),  # no time bound
    SpatialQuery(100.0, 140.0, 10.0, 55.0,
                 DTG_BASE_S + 2 * 86400, DTG_BASE_S + 9 * 86400),  # crosses week edge
    SpatialQuery(-180.0, 180.0, -90.0, 90.0),  # whole world
    SpatialQuery(50.0, 50.5, 20.0, 20.5, DTG_BASE_S, DTG_BASE_S + 86400),  # tiny
]


class TestPlanAndCoarse:
    def test_whole_world_skips_coarse(self):
        plan = plan_query(QUERIES[2])
        assert plan.skip_coarse

    def test_coarse_is_superset_of_exact(self):
        t = derive_and_encode(gen_images_table(20000))
        week = t.column("week").to_numpy()
        z3 = t.column("z3").to_numpy()
        lon = t.column("lon").to_numpy()
        lat = t.column("lat").to_numpy()
        dtg = t.column("dtg_s").to_numpy()
        for q in QUERIES[:2] + QUERIES[3:]:
            plan = plan_query(q)
            cm = coarse_mask(plan, week, z3)
            em = exact_mask(q, lon, lat, dtg)
            assert (em & ~cm).sum() == 0, "coarse filter dropped a matching row"

    def test_coarse_selectivity(self):
        # the coarse filter must prune the vast majority for a small box
        t = derive_and_encode(gen_images_table(20000))
        plan = plan_query(QUERIES[3])
        cm = coarse_mask(plan, t.column("week").to_numpy(), t.column("z3").to_numpy())
        assert cm.mean() < 0.01


class TestScanPipeline:
    def test_scan_matches_oracle(self, ray_session, tiny_fixtures):
        for q in QUERIES:
            want, _ = brute_force_ids(6000, q)
            got = scan(tiny_fixtures, q)
            ids = set()
            for b in got.iter_batches(batch_format="pyarrow"):
                ids.update(b.column("image_id").to_pylist())
            assert ids == want, f"scan mismatch for {q}"

    def test_scan_prunes_payload_columns(self, ray_session, tiny_fixtures):
        got = scan(tiny_fixtures, QUERIES[0])
        names = got.schema().names
        assert "bytes" not in names and "caption" not in names
