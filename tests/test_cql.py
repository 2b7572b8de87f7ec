"""CQL string parsing + end-to-end execution vs the direct API.

Reference parity: GeoMesa queries arrive as ECQL strings (GeoTools
ECQL.toFilter -> QueryFilterSplitter); every supported clause here must
produce the identical result set as the equivalent programmatic call.
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from geomesa_ray.cql import parse_cql
from geomesa_ray.planner import QuerySpec


class TestParse:
    def test_bbox_and_during(self):
        q = parse_cql("BBOX(geom, -10, -5, 25, 30) AND "
                      "dtg DURING 2024-01-03T00:00:00Z/2024-01-10T00:00:00Z")
        assert q.spec.bbox == (-10.0, 25.0, -5.0, 30.0)
        assert q.spec.interval_s == (1704240000, 1704844800)

    def test_ids_and_attr(self):
        q = parse_cql("image_id IN ('a', 'b') AND fmt = 'png'")
        assert q.spec.ids == ["a", "b"]
        assert q.spec.attr_eq == {"fmt": "png"}

    def test_after_before_combine(self):
        q = parse_cql("dtg AFTER 2024-01-02 AND dtg BEFORE 2024-01-05")
        assert q.spec.interval_s == (1704153600, 1704412800)

    def test_intersects_and_dwithin(self):
        q = parse_cql("INTERSECTS(geom, POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)))")
        assert q.geometry_wkts[0].startswith("POLYGON")
        q2 = parse_cql("DWITHIN(geom, POINT(10.0 45.0), 250000, meters)")
        assert q2.dwithins == [(10.0, 45.0, 250000.0)]

    def test_conjoined_time_clauses_intersect(self):
        """A later time clause must NARROW, never widen (review case)."""
        q = parse_cql("dtg AFTER 2024-01-05T00:00:00 AND "
                      "dtg DURING 2024-01-01T00:00:00/2024-01-10T00:00:00")
        assert q.spec.interval_s == (1704412800, 1704844800)  # Jan 5..10

    def test_intersects_plus_dwithin_both_apply(self):
        q = parse_cql(
            "INTERSECTS(geom, POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))) AND "
            "DWITHIN(geom, POINT(1 1), 1000, meters)")
        assert len(q.geometry_wkts) == 1 and len(q.dwithins) == 1

    def test_unsupported_clause_raises(self):
        with pytest.raises(ValueError):
            parse_cql("weird LIKE 'x%'")


class TestExecute:
    def test_bbox_time_matches_query_spec(self, ray_session, tiny_fixtures):
        from geomesa_ray.engine import GeoMesaRayEngine

        eng = GeoMesaRayEngine(tiny_fixtures)
        got = {r["image_id"] for r in eng.cql(
            "BBOX(geom, -10, -5, 25, 30) AND "
            "dtg DURING 2024-01-03T00:00:00Z/2024-01-10T00:00:00Z")
            .select_columns(["image_id"]).take_all()}
        want = {r["image_id"] for r in eng.query(QuerySpec(
            bbox=(-10.0, 25.0, -5.0, 30.0),
            interval_s=(1704240000, 1704844800)))
            .select_columns(["image_id"]).take_all()}
        assert got == want and got

    def test_intersects_matches_pip_join(self, ray_session, tiny_fixtures):
        from geomesa_ray.engine import GeoMesaRayEngine

        eng = GeoMesaRayEngine(tiny_fixtures)
        wkt = "POLYGON ((-30 -20, 10 -20, 10 20, -30 20, -30 -20))"
        got = {r["image_id"] for r in
               eng.cql(f"INTERSECTS(geom, {wkt})").take_all()}
        # oracle: direct scalar PIP over the fixture
        from geomesa_ray.geom.wkt import parse_wkt_geometry
        from geomesa_ray.geom.kernels import points_in_rings
        from geomesa_ray.sources.fixtures import gen_images_table
        from geomesa_ray.stages.derive import derive_geometry

        t = derive_geometry(gen_images_table(6000))
        _, parts = parse_wkt_geometry(wkt)
        m = points_in_rings(t.column("lon").to_numpy(),
                            t.column("lat").to_numpy(), parts[0])
        want = {i for i, hit in zip(t.column("image_id").to_pylist(), m)
                if hit}
        assert got == want and got

    def test_dwithin_matches_proximity(self, ray_session, tiny_fixtures):
        from geomesa_ray.engine import GeoMesaRayEngine

        eng = GeoMesaRayEngine(tiny_fixtures)
        got = {r["image_id"] for r in eng.cql(
            "DWITHIN(geom, POINT(10.0 45.0), 300000, meters)").take_all()}
        want = {r["image_id"] for r in eng.proximity(
            np.array([10.0]), np.array([45.0]), ["p"], 3e5).take_all()}
        assert got == want and got

    def test_ids_with_limit(self, ray_session, tiny_fixtures):
        from geomesa_ray.engine import GeoMesaRayEngine

        eng = GeoMesaRayEngine(tiny_fixtures)
        rows = eng.cql("image_id IN ('img00000010', 'img00000042', "
                       "'img00000099')", limit=2).take_all()
        assert len(rows) == 2


class TestCqlConjuncts:
    def test_intersects_anded_with_time(self, ray_session, tiny_fixtures):
        """Every parsed conjunct participates — geometry AND time."""
        from geomesa_ray.engine import GeoMesaRayEngine
        from geomesa_ray.planner import QuerySpec

        eng = GeoMesaRayEngine(tiny_fixtures)
        wkt = "POLYGON ((-30 -20, 10 -20, 10 20, -30 20, -30 -20))"
        got = {r["image_id"] for r in eng.cql(
            f"INTERSECTS(geom, {wkt}) AND dtg AFTER 2024-01-15").take_all()}
        geo = {r["image_id"] for r in
               eng.cql(f"INTERSECTS(geom, {wkt})").take_all()}
        timed = {r["image_id"] for r in eng.query(QuerySpec(
            interval_s=(1705276800, None)))
            .select_columns(["image_id"]).take_all()}
        assert got == (geo & timed) and got and got != geo

    def test_dwithin_anded_with_ids(self, ray_session, tiny_fixtures):
        from geomesa_ray.engine import GeoMesaRayEngine

        eng = GeoMesaRayEngine(tiny_fixtures)
        base = sorted({r["image_id"] for r in eng.cql(
            "DWITHIN(geom, POINT(10.0 45.0), 1000000, meters)").take_all()})
        assert len(base) >= 2
        pick = base[0]
        got = {r["image_id"] for r in eng.cql(
            "DWITHIN(geom, POINT(10.0 45.0), 1000000, meters) AND "
            f"image_id IN ('{pick}', 'img_not_there')").take_all()}
        assert got == {pick}  # the id conjunct prunes

    def test_intersects_and_dwithin_execution_conjoins(self, ray_session,
                                                       tiny_fixtures):
        """Both geometry predicates must apply (review: the DWITHIN
        branch used to return early, dropping INTERSECTS)."""
        from geomesa_ray.engine import GeoMesaRayEngine

        eng = GeoMesaRayEngine(tiny_fixtures)
        # the polygon's left edge cuts through the DWITHIN circle, so
        # neither predicate subsumes the other
        wkt = "POLYGON ((10 40, 25 40, 25 55, 10 55, 10 40))"
        inter = {r["image_id"] for r in
                 eng.cql(f"INTERSECTS(geom, {wkt})").take_all()}
        near = {r["image_id"] for r in eng.cql(
            "DWITHIN(geom, POINT(10.0 45.0), 1000000, meters)").take_all()}
        both = {r["image_id"] for r in eng.cql(
            f"INTERSECTS(geom, {wkt}) AND "
            "DWITHIN(geom, POINT(10.0 45.0), 1000000, meters)").take_all()}
        assert both == (inter & near)
        assert both < near and both < inter  # genuinely conjoined


class TestCqlTree:
    """Full-grammar CQL (NOT / nested parens / numeric / BETWEEN) —
    execution equivalence against the planner path and set algebra,
    mirroring the reference's FilterHelper normalization semantics."""

    def _ids(self, eng, expr):
        return {r["image_id"] for r in eng.cql(expr).take_all()}

    def _all_ids(self, eng):
        return self._ids(eng, "dtg AFTER 1970-01-01")

    def test_parse_nested_not_between(self):
        from geomesa_ray.cql import parse_cql_tree

        t = parse_cql_tree("NOT (BBOX(geom, 0, 0, 1, 1) OR fmt = 'png') "
                           "AND w BETWEEN 3 AND 6")
        assert t[0] == "and" and t[1][0][0] == "not"
        with pytest.raises(ValueError):
            parse_cql_tree("BBOX(geom, 0, 0, 1, 1) AND")
        with pytest.raises(ValueError):
            parse_cql_tree("(BBOX(geom, 0, 0, 1, 1)")

    def test_not_is_complement(self, ray_session, tiny_fixtures):
        from geomesa_ray.engine import GeoMesaRayEngine

        eng = GeoMesaRayEngine(tiny_fixtures)
        box = "BBOX(geom, -10, -5, 25, 30)"
        inside = self._ids(eng, box)
        outside = self._ids(eng, f"NOT {box}")
        everything = self._all_ids(eng)
        assert inside and outside
        assert inside | outside == everything
        assert inside & outside == set()

    def test_parenthesized_or_under_and(self, ray_session, tiny_fixtures):
        from geomesa_ray.engine import GeoMesaRayEngine

        eng = GeoMesaRayEngine(tiny_fixtures)
        a = "BBOX(geom, -10, -5, 25, 30)"
        b = "BBOX(geom, 5, 10, 40, 45)"
        c = "dtg AFTER 2024-01-15"
        got = self._ids(eng, f"({a} OR {b}) AND {c}")
        want = (self._ids(eng, a) | self._ids(eng, b)) & self._ids(eng, c)
        assert got == want and got

    def test_numeric_comparison_and_between(self, ray_session,
                                            tiny_fixtures):
        import pyarrow.parquet as _pq

        from geomesa_ray.engine import GeoMesaRayEngine
        from geomesa_ray.sources.fixtures import gen_images_table

        eng = GeoMesaRayEngine(tiny_fixtures)
        t = gen_images_table(6000)
        ph = t.column("phash").to_numpy()
        ids = t.column("image_id").to_pylist()
        got = self._ids(eng, "phash < 0")
        want = {i for i, p in zip(ids, ph) if p < 0}
        assert got == want and got and got != set(ids)
        got2 = self._ids(eng, "phash BETWEEN 0 AND 4611686018427387904")
        want2 = {i for i, p in zip(ids, ph) if 0 <= p <= 4611686018427387904}
        assert got2 == want2 and got2

    def test_mixed_spatial_and_numeric(self, ray_session, tiny_fixtures):
        from geomesa_ray.engine import GeoMesaRayEngine

        eng = GeoMesaRayEngine(tiny_fixtures)
        box = "BBOX(geom, -10, -5, 25, 30)"
        got = self._ids(eng, f"{box} AND phash < 0")
        want = self._ids(eng, box) & self._ids(eng, "phash < 0")
        assert got == want and got

    def test_not_intersects_via_tree(self, ray_session, tiny_fixtures):
        """NOT over a geometry predicate: tree path evaluates the same
        PIP kernel the join uses, so complement holds exactly."""
        from geomesa_ray.engine import GeoMesaRayEngine

        eng = GeoMesaRayEngine(tiny_fixtures)
        wkt = "POLYGON ((-30 -20, 10 -20, 10 20, -30 20, -30 -20))"
        inter = self._ids(eng, f"INTERSECTS(geom, {wkt})")
        comp = self._ids(eng, f"NOT INTERSECTS(geom, {wkt})")
        assert inter | comp == self._all_ids(eng)
        assert inter & comp == set()

    def test_numeric_null_and_int64_precision_semantics(self):
        """Leaf-level semantics (review r03): nulls evaluate False under
        EVERY comparison incl. <>; int64 comparisons stay exact past
        2^53 (no float64 round-trip)."""
        import numpy as np
        import pyarrow as pa

        from geomesa_ray.cql import eval_tree, parse_cql_tree

        big = 4611686018427387904  # 2^62
        batch = pa.table({"v": pa.array([1, None, 5, big + 1], pa.int64())})
        lon = lat = dtg = np.zeros(4)
        ne = eval_tree(parse_cql_tree("v <> 5"), batch, lon, lat, dtg)
        assert ne.tolist() == [True, False, False, True]  # null -> False
        eq = eval_tree(parse_cql_tree("v = 5"), batch, lon, lat, dtg)
        assert eq.tolist() == [False, False, True, False]
        # 2^62 + 1 would cast to exactly 2^62 in float64 and pass <=
        le = eval_tree(parse_cql_tree(f"v <= {big}"), batch, lon, lat, dtg)
        assert le.tolist() == [True, False, True, False]
        bt = eval_tree(parse_cql_tree(f"v BETWEEN 0 AND {big}"),
                       batch, lon, lat, dtg)
        assert bt.tolist() == [True, False, True, False]

    def test_beyond_is_dwithin_complement(self, ray_session, tiny_fixtures):
        from geomesa_ray.engine import GeoMesaRayEngine

        eng = GeoMesaRayEngine(tiny_fixtures)
        near = self._ids(eng,
                         "DWITHIN(geom, POINT(10.0 45.0), 1000000, meters)")
        far = self._ids(eng,
                        "BEYOND(geom, POINT(10.0 45.0), 1000000, meters)")
        assert near and far
        assert near | far == self._all_ids(eng)
        assert near & far == set()

    def test_between_absorbs_its_and(self, ray_session, tiny_fixtures):
        from geomesa_ray.engine import GeoMesaRayEngine

        eng = GeoMesaRayEngine(tiny_fixtures)
        # the BETWEEN's AND must not split the conjunction
        got = self._ids(eng, "phash BETWEEN -1e19 AND 1e19 AND fmt = 'raw'")
        assert got == self._ids(eng, "fmt = 'raw'") and got


class TestCqlOr:
    def test_or_of_bboxes_matches_union(self, ray_session, tiny_fixtures):
        from geomesa_ray.engine import GeoMesaRayEngine

        eng = GeoMesaRayEngine(tiny_fixtures)
        a = "BBOX(geom, -10, -5, 25, 30)"
        b = "BBOX(geom, 5, 10, 40, 45)"  # overlaps a
        got = {r["image_id"] for r in eng.cql(f"{a} OR {b}").take_all()}
        ga = {r["image_id"] for r in eng.cql(a)
              .select_columns(["image_id"]).take_all()}
        gb = {r["image_id"] for r in eng.cql(b)
              .select_columns(["image_id"]).take_all()}
        assert got == (ga | gb) and ga - gb and gb - ga  # true union
        # no duplicate rows for the overlap region
        rows = eng.cql(f"{a} OR {b}").take_all()
        assert len(rows) == len(got)

    def test_or_mixing_geometry_and_time(self, ray_session, tiny_fixtures):
        from geomesa_ray.engine import GeoMesaRayEngine

        eng = GeoMesaRayEngine(tiny_fixtures)
        wkt = "POLYGON ((-30 -20, 10 -20, 10 20, -30 20, -30 -20))"
        a = f"INTERSECTS(geom, {wkt})"
        b = ("BBOX(geom, 100, 10, 140, 55) AND "
             "dtg DURING 2024-01-03T00:00:00Z/2024-01-10T00:00:00Z")
        got = {r["image_id"] for r in eng.cql(f"{a} OR {b}").take_all()}
        ga = {r["image_id"] for r in eng.cql(a).take_all()}
        gb = {r["image_id"] for r in eng.cql(b)
              .select_columns(["image_id"]).take_all()}
        assert got == (ga | gb) and got

    def test_or_inside_parens_not_split(self):
        from geomesa_ray.cql import split_or

        assert len(split_or(
            "INTERSECTS(geom, POLYGON ((0 0, 1 0, 1 1, 0 0)))")) == 1
        assert len(split_or("fmt = 'a OR b'")) == 1  # quoted OR ignored


class TestKleene3VL:
    """Three-valued NULL semantics through the boolean tree (review
    r03): ``NOT col = v`` and ``col <> v`` must agree on null rows
    (both exclude them), unknown must propagate through AND/OR/NOT the
    SQL way, integer literals must stay exact past 2^53, and uint64
    columns must not wrap through the int64-exact path."""

    def _m(self, expr, batch):
        import numpy as np

        from geomesa_ray.cql import eval_tree, parse_cql_tree

        z = np.zeros(batch.num_rows)
        return eval_tree(parse_cql_tree(expr), batch, z, z, z).tolist()

    def test_not_agrees_with_ne_on_nulls(self):
        import pyarrow as pa

        batch = pa.table({"fmt": pa.array(["png", None, "jpg"])})
        assert self._m("fmt <> 'png'", batch) == [False, False, True]
        assert self._m("NOT fmt = 'png'", batch) == [False, False, True]
        assert self._m("NOT fmt <> 'png'", batch) == [True, False, False]

    def test_not_between_and_cmp_exclude_nulls(self):
        import pyarrow as pa

        batch = pa.table({"v": pa.array([1, None, 10], pa.int64())})
        assert self._m("NOT v BETWEEN 0 AND 5", batch) == \
            [False, False, True]
        assert self._m("NOT v < 5", batch) == [False, False, True]

    def test_unknown_propagates_through_and_or(self):
        import pyarrow as pa

        batch = pa.table({"v": pa.array([5, None], pa.int64()),
                          "w": pa.array([1, 1], pa.int64())})
        # unknown OR unknown = unknown -> excluded (NOT a tautology)
        assert self._m("v = 5 OR v <> 5", batch) == [True, False]
        # true OR unknown = true
        assert self._m("w = 1 OR v = 5", batch) == [True, True]
        # NOT (true AND unknown) = NOT unknown = unknown -> excluded
        assert self._m("NOT (w = 1 AND v = 5)", batch) == [False, False]
        # NOT (false AND unknown) = NOT false = true -> included
        assert self._m("NOT (w = 2 AND v = 5)", batch) == [True, True]

    def test_not_isin_excludes_nulls(self):
        import pyarrow as pa

        batch = pa.table({"fmt": pa.array(["png", None, "gif"])})
        assert self._m("fmt IN ('png', 'jpg')", batch) == \
            [True, False, False]
        assert self._m("NOT fmt IN ('png', 'jpg')", batch) == \
            [False, False, True]

    def test_int_literal_exact_past_2_53(self):
        import pyarrow as pa

        big = 9007199254740993  # 2^53 + 1: float64 rounds it to 2^53
        batch = pa.table(
            {"v": pa.array([big - 1, big, None], pa.int64())})
        assert self._m(f"v = {big}", batch) == [False, True, False]
        assert self._m(f"v BETWEEN {big} AND {big}", batch) == \
            [False, True, False]
        assert self._m(f"v < {big}", batch) == [True, False, False]

    def test_uint64_column_does_not_wrap(self):
        import pyarrow as pa

        batch = pa.table({"v": pa.array([3, 2**63 + 5], pa.uint64())})
        # int64-exact path would wrap 2^63+5 negative; must fall back
        assert self._m("v > 5", batch) == [False, True]
        assert self._m("v < 5", batch) == [True, False]

    def test_uint64_exact_above_2_63(self):
        """uint64 comparisons are EXACT past 2^63 (a float64 fallback
        would merge neighbors: both 2^63+4 and 2^63+5 round to 2^63)."""
        import pyarrow as pa

        big = 2**63 + 5
        batch = pa.table(
            {"v": pa.array([big - 1, big, None], pa.uint64())})
        assert self._m(f"v = {big}", batch) == [False, True, False]
        assert self._m(f"v < {big}", batch) == [True, False, False]
        # a negative literal can't enter the uint64 path; the float
        # fallback must stay sign-correct
        assert self._m(f"v BETWEEN -5 AND {2**64 - 1}", batch) == \
            [True, True, False]


class TestOrAllTreeFused:
    def test_or_of_tree_only_disjuncts_single_scan_equivalence(
            self, ray_session, tiny_fixtures):
        """When NO disjunct is planner-parseable the engine hands the
        whole expression to one fused-mask tree scan (no N-scan union
        shuffle); result must equal the disjunct union."""
        from geomesa_ray.engine import GeoMesaRayEngine, _planner_parses

        # numeric comparisons are planner-parseable now (attr_range);
        # LIKE/ILIKE remain tree-only
        a = "caption LIKE '%#prairie'"
        b = "caption ILIKE '%#BASALT'"
        assert not _planner_parses(a) and not _planner_parses(b)
        eng = GeoMesaRayEngine(tiny_fixtures)

        def ids(e):
            return {r["image_id"] for r in eng.cql(e).take_all()}

        got = ids(f"{a} OR {b}")
        want = ids(a) | ids(b)
        assert got == want and ids(a) - ids(b)


class TestEcqlExtraLeaves:
    """IS [NOT] NULL, LIKE/ILIKE, DISJOINT — the remaining common ECQL
    predicates (GeoTools ECQL.toFilter accepts all of these)."""

    def _m(self, expr, batch):
        import numpy as np

        from geomesa_ray.cql import eval_tree, parse_cql_tree

        z = np.zeros(batch.num_rows)
        return eval_tree(parse_cql_tree(expr), batch, z, z, z).tolist()

    def test_is_null_is_two_valued(self):
        import pyarrow as pa

        batch = pa.table({"fmt": pa.array(["png", None, "jpg"])})
        assert self._m("fmt IS NULL", batch) == [False, True, False]
        assert self._m("fmt IS NOT NULL", batch) == [True, False, True]
        # NOT (IS NULL) == IS NOT NULL exactly — no unknowns here
        assert self._m("NOT fmt IS NULL", batch) == [True, False, True]

    def test_like_and_ilike(self):
        import pyarrow as pa

        batch = pa.table({"cap": pa.array(
            ["red fox", None, "Red FOX", "dog"])})
        assert self._m("cap LIKE '%fox'", batch) == \
            [True, False, False, False]
        assert self._m("cap ILIKE '%fox'", batch) == \
            [True, False, True, False]
        assert self._m("cap LIKE 'r__ fox'", batch) == \
            [True, False, False, False]
        # null rows stay excluded under NOT LIKE (Kleene)
        assert self._m("NOT cap LIKE '%fox'", batch) == \
            [False, False, True, True]

    def test_disjoint_is_intersects_complement(self, ray_session,
                                               tiny_fixtures):
        from geomesa_ray.engine import GeoMesaRayEngine

        eng = GeoMesaRayEngine(tiny_fixtures)
        wkt = "POLYGON ((-30 -20, 10 -20, 10 20, -30 20, -30 -20))"
        inter = {r["image_id"] for r in
                 eng.cql(f"INTERSECTS(geom, {wkt})").take_all()}
        disj = {r["image_id"] for r in
                eng.cql(f"(DISJOINT(geom, {wkt}))").take_all()}
        both = {r["image_id"] for r in
                eng.cql("dtg AFTER 1970-01-01").take_all()}
        assert inter | disj == both and inter & disj == set()

    def test_like_projects_column_from_store(self, ray_session,
                                             tiny_fixtures, tmp_path):
        """LIKE over the caption column end-to-end (tree_columns must
        project it into the scan)."""
        from geomesa_ray.engine import GeoMesaRayEngine

        eng = GeoMesaRayEngine(tiny_fixtures)
        got = {r["image_id"] for r in
               eng.cql("caption LIKE '%#fjord%'").take_all()}
        assert got  # the word list contains 'fjord'
        got2 = {r["image_id"] for r in
                eng.cql("caption ILIKE '%#FJORD%'").take_all()}
        assert got == got2


class TestNumericComparisons:
    """Planner-grammar numeric comparisons / BETWEEN -> attr_range
    (served by the attribute-index strategy when a store has one)."""

    def test_parse_between(self):
        q = parse_cql("week BETWEEN 5 AND 9")
        assert q.spec.attr_range == {"week": (5, 9, False, False)}

    def test_parse_strict_bounds_conjoin(self):
        q = parse_cql("w > 3 AND w <= 10")
        assert q.spec.attr_range == {"w": (3, 10, True, False)}

    def test_parse_numeric_eq(self):
        q = parse_cql("w = 8")
        assert q.spec.attr_eq == {"w": 8}

    def test_parse_float_literal(self):
        q = parse_cql("value >= 1.5")
        assert q.spec.attr_range == {"value": (1.5, None, False, False)}

    def test_intersect_ranges_tightens(self):
        from geomesa_ray.planner import intersect_ranges

        assert intersect_ranges((1, 10), (3, None, True, False)) == \
            (3, 10, True, False)
        # tie keeps the stricter bound
        assert intersect_ranges((5, None, False, False),
                                (5, None, True, False)) == \
            (5, None, True, False)
        assert intersect_ranges((None, 7, False, True), (2, 7)) == \
            (2, 7, False, True)

    def test_planner_matches_tree_scan(self, ray_session, tiny_fixtures):
        """The same numeric expression through the planner path and the
        fused-tree full scan returns the identical id set."""
        from geomesa_ray.engine import GeoMesaRayEngine

        eng = GeoMesaRayEngine(tiny_fixtures)
        expr = "phash BETWEEN 0 AND 4611686018427387904"
        ids_planner = sorted(r["image_id"] for r in eng.cql(expr).take_all())
        ids_tree = sorted(r["image_id"]
                          for r in eng._cql_tree_scan(expr).take_all())
        assert ids_planner == ids_tree and 0 < len(ids_planner) < 6000

    def test_strict_vs_closed_differ(self, ray_session, tiny_fixtures):
        from geomesa_ray.engine import GeoMesaRayEngine

        t = pq.read_table(f"{tiny_fixtures}/images.parquet",
                          columns=["image_id", "phash"])
        ph = sorted(t.column("phash").to_pylist())
        cut = ph[len(ph) // 2]  # an attained value
        eng = GeoMesaRayEngine(tiny_fixtures)
        n_closed = eng.cql(f"phash >= {cut}").count()
        n_strict = eng.cql(f"phash > {cut}").count()
        assert n_strict == n_closed - ph.count(cut)

    def test_cql_range_served_by_attr_index(self, ray_session,
                                            tiny_fixtures, tmp_path):
        """CQL numeric range over a store with a week index: identical
        rows to the brute-force store filter, via the index path."""
        import pyarrow as pa
        import ray as _ray

        from geomesa_ray.engine import GeoMesaRayEngine
        from geomesa_ray.state.attr_index import build_attr_index
        from geomesa_ray.state.store import read_store, write_store

        d = str(tmp_path / "store")
        write_store(tiny_fixtures, d)
        build_attr_index(d, "week", n_parts=4)
        t = pa.concat_tables(_ray.get(
            read_store(d, columns=["image_id", "week"]).to_arrow_refs()))
        w = t.column("week").to_numpy(zero_copy_only=False)
        lo = int(np.min(w))
        eng = GeoMesaRayEngine(tiny_fixtures, store_dir=d)
        got = sorted(r["image_id"] for r in
                     eng.cql(f"week BETWEEN {lo} AND {lo + 1}")
                     .select_columns(["image_id"]).take_all())
        want = sorted(t.filter(pa.array((w >= lo) & (w <= lo + 1)))
                      .column("image_id").to_pylist())
        assert got == want and len(got) > 0


class TestR3ReviewFixes:
    def test_eq_mask_huge_float_literal(self, tiny_fixtures):
        """pc.equal safe-casts int64 to double for a float literal and
        RAISES past 2^53 (phash values) — eq_mask must compare exactly
        instead (review finding, reproduced on the committed snapshot)."""
        import pyarrow.parquet as pq

        from geomesa_ray.cql import eq_mask

        t = pq.read_table(f"{tiny_fixtures}/images.parquet",
                          columns=["phash"]).slice(0, 1000)
        v = t.column("phash")[0].as_py()
        m = eq_mask(t, "phash", float(1.5e18))
        assert m.sum() == 0  # no crash; nothing equals it in this slice
        m = eq_mask(t, "phash", v)
        assert m[0] and m.sum() >= 1
        # non-integral literal can equal no integer: all-False, no cast
        assert eq_mask(t, "phash", 2.5).sum() == 0
        # out-of-domain literal
        assert eq_mask(t, "phash", float(2**70)).sum() == 0

    def test_engine_eq_huge_float(self, ray_session, tiny_fixtures):
        from geomesa_ray.engine import GeoMesaRayEngine

        eng = GeoMesaRayEngine(tiny_fixtures)
        assert eng.cql("phash = 1.5e18").count() == 0

    def test_contradictory_eq_conjunction(self, ray_session,
                                          tiny_fixtures):
        """'w = 5 AND w = 6' must yield the EMPTY set, not last-wins
        (review finding: attr_eq dict overwrote silently). parse_cql
        raises; the engine falls back to the tree grammar which
        evaluates the contradiction correctly."""
        from geomesa_ray.cql import parse_cql
        from geomesa_ray.engine import GeoMesaRayEngine

        with pytest.raises(ValueError, match="contradictory"):
            parse_cql("w = 5 AND w = 6")
        with pytest.raises(ValueError, match="contradictory"):
            parse_cql("fmt = 'a' AND fmt = 'b'")
        # same value twice is a no-op, stays on the planner path
        q = parse_cql("w = 8 AND w = 8")
        assert q.spec.attr_eq == {"w": 8}
        eng = GeoMesaRayEngine(tiny_fixtures)
        assert eng.cql("w = 8 AND w = 6").count() == 0
        assert eng.cql("fmt = 'raw' AND fmt = 'png'").count() == 0
