"""Geometry kernel tests: vectorized PIP vs an independent scalar oracle
(winding-number algorithm), IDL splitting, distances."""

import numpy as np

from geomesa_ray.geom import (
    Polygon,
    haversine_m,
    normalize_lon,
    parse_wkt_polygon,
    planar_sq_deg,
    points_in_bbox,
    points_in_polygon,
    polygon_to_wkt,
    split_idl_polygon,
)


def winding_number_contains(px, py, xs, ys):
    """Independent scalar PIP oracle (winding number, different algorithm
    from the production even-odd ray cast)."""
    wn = 0
    n = len(xs)
    for i in range(n):
        x0, y0 = xs[i], ys[i]
        x1, y1 = xs[(i + 1) % n], ys[(i + 1) % n]
        if y0 <= py:
            if y1 > py and ((x1 - x0) * (py - y0) - (px - x0) * (y1 - y0)) > 0:
                wn += 1
        else:
            if y1 <= py and ((x1 - x0) * (py - y0) - (px - x0) * (y1 - y0)) < 0:
                wn -= 1
    return wn != 0


class TestPIP:
    def test_square(self):
        poly = Polygon(np.array([0.0, 10.0, 10.0, 0.0]), np.array([0.0, 0.0, 10.0, 10.0]))
        lon = np.array([5.0, 15.0, -1.0, 9.99])
        lat = np.array([5.0, 5.0, 5.0, 0.01])
        assert points_in_polygon(lon, lat, poly).tolist() == [True, False, False, True]

    def test_vs_winding_oracle_random(self):
        rng = np.random.default_rng(11)
        for trial in range(8):
            nv = int(rng.integers(5, 24))
            ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
            r = rng.uniform(1.0, 4.0, nv)
            xs = 10.0 + r * np.cos(ang)
            ys = -5.0 + r * np.sin(ang)
            poly = Polygon(xs, ys)
            px = rng.uniform(4.0, 16.0, 500)
            py = rng.uniform(-11.0, 1.0, 500)
            got = points_in_polygon(px, py, poly)
            want = np.array([winding_number_contains(px[i], py[i], xs, ys)
                             for i in range(len(px))])
            assert (got == want).all()

    def test_concave(self):
        # U-shape: the notch must be excluded
        xs = np.array([0.0, 10.0, 10.0, 6.0, 6.0, 4.0, 4.0, 0.0])
        ys = np.array([0.0, 0.0, 10.0, 10.0, 2.0, 2.0, 10.0, 10.0])
        poly = Polygon(xs, ys)
        assert points_in_polygon(np.array([5.0]), np.array([5.0]), poly)[0] == False  # noqa: E712
        assert points_in_polygon(np.array([5.0]), np.array([1.0]), poly)[0] == True  # noqa: E712


class TestBBoxAndDistance:
    def test_bbox(self):
        m = points_in_bbox(np.array([1.0, 5.0]), np.array([1.0, 5.0]), 0, 2, 0, 2)
        assert m.tolist() == [True, False]

    def test_haversine_known(self):
        # London -> Paris ~ 343.5 km
        d = float(haversine_m(-0.1278, 51.5074, 2.3522, 48.8566))
        assert 330_000 < d < 360_000

    def test_haversine_zero(self):
        assert float(haversine_m(10.0, 20.0, 10.0, 20.0)) == 0.0

    def test_planar_sq(self):
        assert float(planar_sq_deg(3.0, 4.0, 0.0, 0.0)) == 25.0


class TestIDL:
    def test_normalize(self):
        assert normalize_lon(np.array([181.0, -181.0, 0.0])).tolist() == [-179.0, 179.0, 0.0]

    def test_split_crossing(self):
        polys = split_idl_polygon(
            np.array([179.0, 181.5, 181.5, 179.0]),
            np.array([-12.0, -12.0, -4.0, -4.0]),
        )
        assert len(polys) == 2
        east = [p for p in polys if p.bbox[0] >= 170.0][0]
        west = [p for p in polys if p.bbox[1] <= -170.0][0]
        assert east.bbox[:2] == (179.0, 180.0)
        assert west.bbox[:2] == (-180.0, -178.5)
        # a point at lon=-179 must fall in the west part
        assert points_in_polygon(np.array([-179.0]), np.array([-8.0]), west)[0]

    def test_no_split_needed(self):
        polys = split_idl_polygon(np.array([0.0, 1.0, 1.0]), np.array([0.0, 0.0, 1.0]))
        assert len(polys) == 1


class TestWKT:
    def test_roundtrip(self):
        poly = Polygon(np.array([45.0, 48.0, 48.0, 45.0]), np.array([23.0, 23.0, 27.0, 27.0]))
        back = parse_wkt_polygon(polygon_to_wkt(poly))
        assert np.allclose(back.xs, poly.xs) and np.allclose(back.ys, poly.ys)

    def test_parse_reference_fixture_polygon(self):
        # the reference test polygon (iterators/TestData.scala:40)
        p = parse_wkt_polygon("POLYGON((45 23, 48 23, 48 27, 45 27, 45 23))")
        assert p.bbox == (45.0, 48.0, 23.0, 27.0)
        assert points_in_polygon(np.array([46.0]), np.array([25.0]), p)[0]


class TestPolygonRelate:
    """Area-area DE-9IM named predicates (JTS geometry.relate role)."""

    @staticmethod
    def sq(x0, y0, x1, y1):
        from geomesa_ray.geom.kernels import Polygon

        return Polygon(np.array([x0, x1, x1, x0], float),
                       np.array([y0, y0, y1, y1], float))

    def test_named_predicates(self):
        from geomesa_ray.geom.kernels import polygon_relate as rel

        A = [self.sq(0, 0, 10, 10)]
        assert rel(A, [self.sq(20, 20, 30, 30)]) == "disjoint"
        assert rel(A, [self.sq(10, 0, 20, 10)]) == "touches"  # shared edge
        assert rel(A, [self.sq(10, 10, 20, 20)]) == "touches"  # corner
        assert rel(A, [self.sq(5, 5, 15, 15)]) == "overlaps"
        assert rel(A, [self.sq(2, 2, 8, 8)]) == "contains"
        assert rel([self.sq(2, 2, 8, 8)], A) == "within"
        assert rel(A, [self.sq(0, 0, 10, 10)]) == "equals"

    def test_hole_semantics(self):
        from geomesa_ray.geom.kernels import polygon_relate as rel

        donut = [self.sq(0, 0, 10, 10), self.sq(3, 3, 7, 7)]
        # a polygon fully inside the hole is DISJOINT from the donut
        assert rel([self.sq(4, 4, 6, 6)], donut) == "disjoint"
        assert rel(donut, [self.sq(4, 4, 6, 6)]) == "disjoint"
        # a polygon inside the solid part is within
        assert rel([self.sq(1, 1, 2, 2)], donut) == "within"
        # one crossing the hole boundary overlaps
        assert rel([self.sq(2, 2, 5, 5)], donut) == "overlaps"

    def test_interior_touch_is_touches_not_overlap(self):
        from geomesa_ray.geom.kernels import Polygon
        from geomesa_ray.geom.kernels import polygon_relate as rel

        # triangle touching the square's edge at one vertex from outside
        tri = [Polygon(np.array([10.0, 15.0, 15.0]),
                       np.array([5.0, 2.0, 8.0]))]
        assert rel([self.sq(0, 0, 10, 10)], tri) == "touches"

    def test_relate_consistent_with_tile_relations(self):
        """Box-box relate must agree with the vectorized DE-9IM tile
        classifier on its own fixture."""
        from geomesa_ray.geom.kernels import polygon_relate as rel
        from geomesa_ray.pipelines.tiles import box_tile_relations
        from geomesa_ray.curve.zorder import z2_decode

        L0, L1, A0, A1 = -45.0, 30.0, -22.5, 30.0
        t = box_tile_relations(L0, L1, A0, A1, level=4)
        q = [self.sq(L0, A0, L1, A1)]
        n = 1 << 4
        w, h = 360.0 / n, 180.0 / n
        for row in t.to_pylist():
            ix, iy = z2_decode(np.uint64(row["tile"]))
            tx0 = -180.0 + float(ix) * w
            ty0 = -90.0 + float(iy) * h
            tile_poly = [self.sq(tx0, ty0, tx0 + w, ty0 + h)]
            got = rel(tile_poly, q)
            assert got == row["relation"], (row, got)

    def test_boundary_aligned_cases_from_review(self):
        """Cases where every VERTEX lies on the other's boundary — the
        vertex-only interior vote misclassified all three as 'touches'."""
        from geomesa_ray.geom.kernels import Polygon
        from geomesa_ray.geom.kernels import polygon_relate as rel

        big = [self.sq(0, 0, 10, 10)]
        assert rel([self.sq(0, 0, 5, 10)], big) == "within"
        assert rel(big, [self.sq(0, 0, 5, 10)]) == "contains"
        assert rel(big, [self.sq(5, 0, 15, 10)]) == "overlaps"
        # same square with an extra collinear vertex is still EQUAL
        redundant = [Polygon(np.array([0.0, 5, 10, 10, 0]),
                             np.array([0.0, 0, 0, 10, 10]))]
        assert rel(big, redundant) == "equals"
        assert rel(redundant, big) == "equals"

    def test_grid_aligned_tile_agreement(self):
        """The aligned query box the review showed disagreeing."""
        from geomesa_ray.geom.kernels import polygon_relate as rel
        from geomesa_ray.pipelines.tiles import box_tile_relations
        from geomesa_ray.curve.zorder import z2_decode

        L0, L1, A0, A1 = -45.0, -11.25, -22.5, -11.25  # fully aligned
        t = box_tile_relations(L0, L1, A0, A1, level=4)
        q = [self.sq(L0, A0, L1, A1)]
        n = 1 << 4
        w, h = 360.0 / n, 180.0 / n
        for row in t.to_pylist():
            ix, iy = z2_decode(np.uint64(row["tile"]))
            tx0 = -180.0 + float(ix) * w
            ty0 = -90.0 + float(iy) * h
            tile_poly = [self.sq(tx0, ty0, tx0 + w, ty0 + h)]
            assert rel(tile_poly, q) == row["relation"], row
