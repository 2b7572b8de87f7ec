"""PIP join vs brute-force oracle (FIXTURES.md F4: exact (image_id,
region_id) row-set equality, the analog of the reference asserting feature
ids against MockAccumulo scans)."""

import numpy as np
import pyarrow.parquet as pq

from geomesa_ray.geom.kernels import split_idl_polygon
from geomesa_ray.geom.wkt import parse_wkt_polygon
from geomesa_ray.pipelines.pip_join import build_region_index, pip_join
from geomesa_ray.sources.fixtures import gen_images_table, gen_regions_table
from geomesa_ray.stages.encode import derive_and_encode
from tests.test_geom import winding_number_contains


def brute_force_pairs(n_images: int, regions) -> set:
    """Independent oracle: scalar winding-number PIP over every
    (point, region) pair (no cells, no index)."""
    t = derive_and_encode(gen_images_table(n_images))
    lon = t.column("lon").to_numpy()
    lat = t.column("lat").to_numpy()
    dtg = t.column("dtg_s").to_numpy()
    ids = t.column("image_id").to_pylist()
    import calendar

    out = set()
    for r in regions.to_pylist():
        # naive datetimes from parquet are UTC; avoid local-TZ .timestamp()
        ts = calendar.timegm(r["t_start"].utctimetuple())
        te = calendar.timegm(r["t_end"].utctimetuple())
        tm = (dtg >= ts) & (dtg <= te)
        if r["kind"] == "box":
            m = tm & (lon >= r["lon_min"]) & (lon <= r["lon_max"]) \
                & (lat >= r["lat_min"]) & (lat <= r["lat_max"])
            for i in np.nonzero(m)[0]:
                out.add((ids[i], r["region_id"]))
        else:
            p = parse_wkt_polygon(r["wkt"])
            parts = split_idl_polygon(p.xs, p.ys)
            cand = np.nonzero(tm)[0]
            for i in cand:
                if any(winding_number_contains(lon[i], lat[i], pp.xs, pp.ys)
                       for pp in parts):
                    out.add((ids[i], r["region_id"]))
    return out


class TestRegionIndex:
    def test_world_region_candidates_everything(self):
        regions = gen_regions_table()
        idx = build_region_index(regions)
        t = derive_and_encode(gen_images_table(100))
        cell = t.column("cell").to_numpy()
        pts, ords = idx.lookup(cell)
        world_ord = idx.region_ids.index("r_world")
        assert set(pts[ords == world_ord].tolist()) == set(range(100))

    def test_each_pair_candidate_at_most_once(self):
        regions = gen_regions_table()
        idx = build_region_index(regions)
        t = derive_and_encode(gen_images_table(2000))
        pts, ords = idx.lookup(t.column("cell").to_numpy())
        pairs = list(zip(pts.tolist(), ords.tolist()))
        assert len(pairs) == len(set(pairs)), "duplicate candidate pair"


class TestPIPJoin:
    def test_join_matches_bruteforce(self, ray_session, tiny_fixtures):
        regions = pq.read_table(f"{tiny_fixtures}/regions.parquet")
        want = brute_force_pairs(6000, regions)
        ds = pip_join(tiny_fixtures)
        got = set()
        for b in ds.iter_batches(batch_format="pyarrow"):
            got.update(zip(b.column("image_id").to_pylist(),
                           b.column("region_id").to_pylist()))
        missing = want - got
        extra = got - want
        assert not missing and not extra, (
            f"missing={list(missing)[:5]} extra={list(extra)[:5]} "
            f"(want {len(want)}, got {len(got)})")

    def test_join_boxes_only(self, ray_session, tiny_fixtures):
        regions = pq.read_table(f"{tiny_fixtures}/regions.parquet")
        import pyarrow.compute as pc

        box_regions = regions.filter(pc.field("kind").isin(["box"]))
        want = brute_force_pairs(6000, box_regions)
        ds = pip_join(tiny_fixtures, kinds=("box",))
        got = set()
        for b in ds.iter_batches(batch_format="pyarrow"):
            got.update(zip(b.column("image_id").to_pylist(),
                           b.column("region_id").to_pylist()))
        assert got == want

    def test_idl_region_matches_both_sides(self, ray_session, tiny_fixtures):
        """Points on both sides of the date line must join to r_idl."""
        regions = gen_regions_table()
        want = brute_force_pairs(6000, regions)
        idl_pairs = {p for p in want if p[1] == "r_idl"}
        # fixture data is uniform; with 6000 points over the globe the IDL
        # strip (2.5 deg x 8 deg) should catch at least one
        ds = pip_join(tiny_fixtures)
        got_idl = set()
        for b in ds.iter_batches(batch_format="pyarrow"):
            for i, r in zip(b.column("image_id").to_pylist(),
                            b.column("region_id").to_pylist()):
                if r == "r_idl":
                    got_idl.add((i, r))
        assert got_idl == idl_pairs


class TestAttachPayload:
    def test_payload_rejoin(self, ray_session, tiny_fixtures):
        from geomesa_ray.pipelines.pip_join import attach_payload, pip_join

        join = pip_join(tiny_fixtures, kinds=("box",))
        n_join = join.count()
        full = attach_payload(join, tiny_fixtures, payload_cols=("caption",))
        rows = full.take_all()
        assert len(rows) == n_join
        ref = gen_images_table(6000)
        cap = dict(zip(ref.column("image_id").to_pylist(),
                       ref.column("caption").to_pylist()))
        for r in rows[:200]:
            assert r["caption"] == cap[r["image_id"]]


class TestComplexGeometry:
    """Arbitrary-geometry joins: polygon-with-holes, MULTIPOLYGON,
    buffered LINESTRING corridor (QueryProcess.scala:24-35 accepts any
    JTS geometry). Oracle: scalar winding-number / segment-distance
    brute force, independent of the library kernels."""

    @staticmethod
    def _oracle_pairs(n_images: int) -> set:
        from geomesa_ray.geom.wkt import parse_wkt_geometry
        from geomesa_ray.sources.fixtures import gen_complex_regions_table

        t = derive_and_encode(gen_images_table(n_images))
        lon = t.column("lon").to_numpy()
        lat = t.column("lat").to_numpy()
        ids = t.column("image_id").to_pylist()
        out = set()
        for r in gen_complex_regions_table().to_pylist():
            kind, parts = parse_wkt_geometry(r["wkt"])
            for i in range(len(ids)):
                if kind == "line":
                    xs, ys = parts[0]
                    best = np.inf
                    for s in range(len(xs) - 1):
                        dx, dy = xs[s + 1] - xs[s], ys[s + 1] - ys[s]
                        L = dx * dx + dy * dy
                        tt = 0.0 if L == 0 else min(
                            1.0, max(0.0, ((lon[i] - xs[s]) * dx
                                           + (lat[i] - ys[s]) * dy) / L))
                        ex = lon[i] - (xs[s] + tt * dx)
                        ey = lat[i] - (ys[s] + tt * dy)
                        best = min(best, ex * ex + ey * ey)
                    hit = best <= r["buf_deg"] ** 2
                else:
                    hit = False
                    for rings in parts:
                        inside = winding_number_contains(
                            lon[i], lat[i], rings[0].xs, rings[0].ys)
                        for hole in rings[1:]:
                            if winding_number_contains(
                                    lon[i], lat[i], hole.xs, hole.ys):
                                inside = False
                        hit = hit or inside
                if hit:
                    out.add((ids[i], r["region_id"]))
        return out

    def test_complex_join_matches_bruteforce(self, ray_session, tiny_fixtures):
        from geomesa_ray.sources.fixtures import gen_complex_regions_table

        want = self._oracle_pairs(6000)
        assert want, "fixture regions must catch some points"
        # every region kind must contribute at least one pair
        assert {r for _, r in want} == {
            "cx_holes", "cx_multi", "cx_multi_hole", "cx_corridor"}
        ds = pip_join(tiny_fixtures, regions=gen_complex_regions_table(),
                      kinds=("poly", "multipoly", "line"))
        got = set()
        for b in ds.iter_batches(batch_format="pyarrow"):
            got.update(zip(b.column("image_id").to_pylist(),
                           b.column("region_id").to_pylist()))
        assert got == want

    def test_cogroup_matches_broadcast_on_complex(self, ray_session,
                                                  tiny_fixtures):
        from geomesa_ray.pipelines.pip_cogroup import pip_join_cogroup
        from geomesa_ray.sources.fixtures import gen_complex_regions_table

        want = self._oracle_pairs(6000)
        ds = pip_join_cogroup(tiny_fixtures, gen_complex_regions_table(),
                              hot_threshold=500)  # force salting
        got = set()
        for b in ds.iter_batches(batch_format="pyarrow"):
            got.update(zip(b.column("image_id").to_pylist(),
                           b.column("region_id").to_pylist()))
        assert got == want

    def test_hole_excludes_interior_point(self):
        from geomesa_ray.geom.kernels import Polygon, points_in_rings

        shell = Polygon(np.array([-30.0, 10, 10, -30]),
                        np.array([-20.0, -20, 20, 20]))
        hole = Polygon(np.array([-20.0, 0, 0, -20]),
                       np.array([-10.0, -10, 10, 10]))
        lon = np.array([-10.0, -25.0, 50.0])  # in hole, in shell, outside
        m = points_in_rings(lon, np.array([0.0, 0.0, 0.0]), [shell, hole])
        assert m.tolist() == [False, True, False]

    def test_wkt_parse_variants(self):
        from geomesa_ray.geom.wkt import parse_wkt_geometry

        k, p = parse_wkt_geometry(
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
        assert k == "poly" and len(p) == 1 and len(p[0]) == 2
        k, p = parse_wkt_geometry(
            "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))")
        assert k == "multipoly" and len(p) == 2
        k, p = parse_wkt_geometry("LINESTRING (0 0, 1 1, 2 0)")
        assert k == "line" and len(p[0][0]) == 3
        import pytest

        with pytest.raises(ValueError):
            parse_wkt_geometry("GEOMETRYCOLLECTION (POINT (0 0))")

    def test_idl_with_holes_raises(self):
        from geomesa_ray.pipelines.pip_join import region_polys
        import pytest

        with pytest.raises(NotImplementedError):
            region_polys("poly",
                         "POLYGON ((179 0, 182 0, 182 5, 179 5, 179 0), "
                         "(180 1, 181 1, 181 2, 180 2, 180 1))")


class TestDistributedIndexBuild:
    def test_matches_driver_build(self, ray_session, tiny_fixtures):
        """The distributed cover/parse build must produce an index whose
        join output is identical to the driver-side build, for every
        geometry kind (boxes, polys, IDL, holes, multipoly, corridor)."""
        from geomesa_ray.pipelines.pip_join import (
            build_region_index_distributed,
            pip_join_points,
        )
        from geomesa_ray.sources.fixtures import (
            gen_complex_regions_table,
            gen_regions_table,
        )
        from geomesa_ray.sources.io import read_images
        from geomesa_ray.stages.encode import derive_and_encode

        for regions in (gen_regions_table(), gen_complex_regions_table()):
            ds = read_images(tiny_fixtures, columns=["image_id", "phash"])
            ds = ds.map_batches(derive_and_encode, batch_format="pyarrow")
            want = set()
            for b in pip_join_points(ds, regions).iter_batches(
                    batch_format="pyarrow"):
                want.update(zip(b.column("image_id").to_pylist(),
                                b.column("region_id").to_pylist()))
            # distributed build, then run the SAME probe stage with it
            import ray as _ray

            from geomesa_ray.pipelines.pip_join import _refine_batch
            from geomesa_ray.util import resolve_broadcast

            import ray.data as _rd

            # force MULTIPLE blocks so the cross-block gather/ordinal
            # remap — the actual distributed machinery — is exercised
            idx = build_region_index_distributed(
                _rd.from_arrow(regions).repartition(6))
            ref = _ray.put(idx)

            def refine(batch, _ref=ref):
                return _refine_batch(resolve_broadcast(_ref), batch,
                                     ("image_id",))

            ds2 = read_images(tiny_fixtures, columns=["image_id", "phash"])
            ds2 = ds2.map_batches(derive_and_encode, batch_format="pyarrow")
            got = set()
            for b in ds2.map_batches(refine, batch_format="pyarrow") \
                    .iter_batches(batch_format="pyarrow"):
                got.update(zip(b.column("image_id").to_pylist(),
                               b.column("region_id").to_pylist()))
            assert got == want and got

    def test_empty_and_duplicate_id_handling(self, ray_session):
        import pyarrow as pa
        import pytest

        from geomesa_ray.pipelines.pip_join import (
            build_region_index_distributed,
        )
        from geomesa_ray.sources.fixtures import gen_regions_table

        regions = gen_regions_table()
        empty = regions.slice(0, 0)
        idx = build_region_index_distributed(empty)
        assert idx.region_ids == [] and idx.levels == {}
        dup = pa.concat_tables([regions.slice(0, 2), regions.slice(0, 1)])
        with pytest.raises(ValueError):
            build_region_index_distributed(dup)
