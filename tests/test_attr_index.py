"""Secondary attribute index: build / pruned query / record join / resume.

Reference parity targets:
- distributed index build over an existing store = ``AttributeIndexJob``
  (``geomesa-jobs/.../index/AttributeIndexJob.scala:35-99``)
- value-sorted scan + JOIN/FULL coverage = ``AttributeIdxStrategy``
  (``geomesa-accumulo/.../index/AttributeIdxStrategy.scala:85-120``)
- secondary spatio-temporal refinement on the carried index value =
  ``IndexValueEncoder`` (geom + dtg stored with the index entry)

Every query result is compared keyed by image_id against a brute-force
filter of the same store (and DuckDB on the source table for the
equality case).
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from geomesa_ray.state.attr_index import (attr_index_exists,
                                          build_attr_index,
                                          parts_for_predicate,
                                          query_attr_index,
                                          read_attr_index)
from geomesa_ray.state.store import read_store, write_store


@pytest.fixture(scope="module")
def astore(ray_session, tiny_fixtures, tmp_path_factory):
    """One store + two indexes shared by the whole module: caption
    (string, JOIN coverage) and week (int, FULL coverage)."""
    d = str(tmp_path_factory.mktemp("attr") / "store")
    write_store(tiny_fixtures, d)
    build_attr_index(d, "caption", n_parts=8, coverage="join")
    build_attr_index(d, "week", n_parts=4, coverage="full")
    return d


def _store_table(astore, columns=None):
    import ray

    return pa.concat_tables(
        ray.get(read_store(astore, columns=columns).to_arrow_refs()))


def _ids(ds):
    return sorted(r["image_id"] for r in
                  ds.select_columns(["image_id"]).take_all())


class TestBuild:
    def test_meta_and_partitions(self, astore):
        assert attr_index_exists(astore, "caption")
        assert attr_index_exists(astore, "week")
        idir = os.path.join(astore, "attr_idx", "caption")
        parts = [p for p in os.listdir(idir) if p.startswith("part=")]
        assert len(parts) > 1  # boundaries actually split the corpus

    def test_partitions_value_sorted_and_disjoint(self, astore):
        idir = os.path.join(astore, "attr_idx", "caption")
        ranges = []
        for p in sorted(os.listdir(idir)):
            if not p.startswith("part="):
                continue
            t = pq.read_table(os.path.join(idir, p, "data.parquet"),
                              columns=["caption"])
            v = t.column("caption").to_pylist()
            assert v == sorted(v)  # value-sorted within partition
            ranges.append((int(p[len("part="):]), v[0], v[-1]))
        ranges.sort()
        for (_, _, hi_prev), (_, lo_next, _) in zip(ranges, ranges[1:]):
            assert hi_prev <= lo_next  # contiguous, range-partitioned

    def test_index_rows_cover_store(self, astore):
        # one index row per store row (captions are non-null)
        n_store = _store_table(astore, ["image_id"]).num_rows
        idir = os.path.join(astore, "attr_idx", "caption")
        n_idx = sum(pq.read_metadata(
            os.path.join(idir, p, "data.parquet")).num_rows
            for p in os.listdir(idir) if p.startswith("part="))
        assert n_idx == n_store


class TestQuery:
    def test_eq_matches_bruteforce_and_duckdb(self, astore, tiny_fixtures):
        t = _store_table(astore, ["image_id", "caption"])
        val = t.column("caption")[5].as_py()
        want = sorted(t.filter(pc.equal(t.column("caption"), val))
                      .column("image_id").to_pylist())
        got = _ids(query_attr_index(astore, "caption", eq=val))
        assert got == want

        import duckdb

        oracle = [r[0] for r in duckdb.sql(
            "SELECT image_id FROM read_parquet($p) WHERE caption = $v "
            "ORDER BY image_id",
            params={"p": os.path.join(tiny_fixtures, "images.parquet"),
                    "v": val}).fetchall()]
        assert got == oracle

    def test_int_range_matches_bruteforce(self, astore):
        t = _store_table(astore, ["image_id", "week"])
        w = t.column("week").to_numpy(zero_copy_only=False)
        lo, hi = int(np.min(w)), int(np.min(w)) + 1
        want = sorted(t.filter(
            pc.and_(pc.greater_equal(t.column("week"), lo),
                    pc.less_equal(t.column("week"), hi)))
            .column("image_id").to_pylist())
        got = _ids(query_attr_index(astore, "week", lo=lo, hi=hi))
        assert got == want and len(got) > 0

    def test_open_bounds(self, astore):
        t = _store_table(astore, ["image_id", "week"])
        w = t.column("week").to_numpy(zero_copy_only=False)
        mid = int(np.median(w))
        want_lo = sorted(t.filter(pc.greater_equal(t.column("week"), mid))
                         .column("image_id").to_pylist())
        assert _ids(query_attr_index(astore, "week", lo=mid)) == want_lo
        want_hi = sorted(t.filter(pc.less_equal(t.column("week"), mid))
                         .column("image_id").to_pylist())
        assert _ids(query_attr_index(astore, "week", hi=mid)) == want_hi

    def test_string_range(self, astore):
        t = _store_table(astore, ["image_id", "caption"])
        caps = sorted(t.column("caption").to_pylist())
        lo, hi = caps[len(caps) // 4], caps[len(caps) // 2]
        want = sorted(t.filter(
            pc.and_(pc.greater_equal(t.column("caption"), lo),
                    pc.less_equal(t.column("caption"), hi)))
            .column("image_id").to_pylist())
        got = _ids(query_attr_index(astore, "caption", lo=lo, hi=hi))
        assert got == want and len(got) > 0

    def test_secondary_spatial_refinement(self, astore):
        from geomesa_ray.pipelines.scan import SpatialQuery, exact_mask

        q = SpatialQuery(-60.0, 60.0, -30.0, 30.0, None, None)
        t = _store_table(astore,
                         ["image_id", "week", "lon", "lat", "dtg_s"])
        w = t.column("week").to_numpy(zero_copy_only=False)
        lo, hi = int(np.min(w)), int(np.max(w))
        m = exact_mask(q, t.column("lon").to_numpy(zero_copy_only=False),
                       t.column("lat").to_numpy(zero_copy_only=False),
                       t.column("dtg_s").to_numpy(zero_copy_only=False))
        want = sorted(t.filter(pa.array(
            m & (w >= lo) & (w <= hi))).column("image_id").to_pylist())
        got = _ids(query_attr_index(astore, "week", lo=lo, hi=hi, query=q))
        assert got == want and 0 < len(got) < t.num_rows

    def test_join_returns_full_record(self, astore):
        """JOIN coverage reunites the payload: caption + phash come back
        byte-identical to the store row."""
        t = _store_table(astore, ["image_id", "caption", "phash"])
        val = t.column("caption")[7].as_py()
        rows = query_attr_index(astore, "caption", eq=val).take_all()
        assert rows and all(r["caption"] == val for r in rows)
        by_id = {t.column("image_id")[i].as_py():
                 t.column("phash")[i].as_py() for i in range(t.num_rows)}
        for r in rows:
            assert r["phash"] == by_id[r["image_id"]]

    def test_covered_projection_skips_join(self, astore):
        """A projection within the index value returns without touching
        the record table (results still exact)."""
        t = _store_table(astore, ["image_id", "caption", "lon"])
        val = t.column("caption")[9].as_py()
        rows = query_attr_index(astore, "caption", eq=val,
                                columns=["image_id", "lon"]).take_all()
        by_id = {t.column("image_id")[i].as_py():
                 t.column("lon")[i].as_py() for i in range(t.num_rows)}
        assert rows and all(r["lon"] == by_id[r["image_id"]] for r in rows)

    def test_projection_through_join(self, astore):
        val = _store_table(astore, ["caption"]).column("caption")[3].as_py()
        rows = query_attr_index(astore, "caption", eq=val,
                                columns=["caption", "phash"]).take_all()
        assert rows and set(rows[0].keys()) == {"caption", "phash"}


class TestPruning:
    def test_eq_touches_few_partitions(self, astore):
        t = _store_table(astore, ["caption"])
        val = t.column("caption")[11].as_py()
        idir = os.path.join(astore, "attr_idx", "caption")
        n_all = len([p for p in os.listdir(idir) if p.startswith("part=")])
        touched = parts_for_predicate(astore, "caption", eq=val)
        assert len(touched) == 1 < n_all

    def test_full_range_touches_all(self, astore):
        caps = _store_table(astore, ["caption"]).column("caption")
        lo = pc.min(caps).as_py()
        hi = pc.max(caps).as_py()
        idir = os.path.join(astore, "attr_idx", "caption")
        n_all = len([p for p in os.listdir(idir) if p.startswith("part=")])
        assert len(parts_for_predicate(astore, "caption",
                                       lo=lo, hi=hi)) == n_all

    def test_out_of_domain_returns_empty(self, astore):
        assert parts_for_predicate(astore, "week", eq=-1) == []
        ds = read_attr_index(astore, "week", eq=-1)
        assert ds.count() == 0


class TestResume:
    def test_rebuild_skips_committed_partitions(self, ray_session,
                                                tiny_fixtures, tmp_path):
        d = str(tmp_path / "store")
        write_store(tiny_fixtures, d)
        build_attr_index(d, "week", n_parts=4)
        idir = os.path.join(d, "attr_idx", "week")
        parts = sorted(p for p in os.listdir(idir) if p.startswith("part="))
        assert len(parts) >= 2
        # simulate a killed run: one partition lost its manifest
        victim = parts[0]
        os.remove(os.path.join(idir, victim, "manifest.json"))
        mtimes = {p: os.path.getmtime(os.path.join(idir, p, "data.parquet"))
                  for p in parts[1:]}
        build_attr_index(d, "week", n_parts=4)
        # committed partitions were not rewritten; the victim was
        for p, mt in mtimes.items():
            assert os.path.getmtime(
                os.path.join(idir, p, "data.parquet")) == mt
        assert os.path.exists(os.path.join(idir, victim, "manifest.json"))

    def test_scheme_guard(self, ray_session, tiny_fixtures, tmp_path):
        d = str(tmp_path / "store")
        write_store(tiny_fixtures, d)
        build_attr_index(d, "week", n_parts=4)
        with pytest.raises(ValueError, match="different index scheme"):
            build_attr_index(d, "week", n_parts=8)


class TestEngineIntegration:
    def test_attribute_strategy_uses_index(self, ray_session,
                                           tiny_fixtures, astore):
        from geomesa_ray.engine import GeoMesaRayEngine
        from geomesa_ray.planner import QuerySpec, Strategy, choose_strategy

        t = _store_table(astore, ["image_id", "week"])
        w = t.column("week").to_numpy(zero_copy_only=False)
        lo = int(np.min(w))
        spec = QuerySpec(attr_range={"week": (lo, lo + 1)})
        assert choose_strategy(spec) is Strategy.ATTRIBUTE

        eng = GeoMesaRayEngine(tiny_fixtures, store_dir=astore)
        got = _ids(eng.query(spec))
        want = sorted(t.filter(pa.array((w >= lo) & (w <= lo + 1)))
                      .column("image_id").to_pylist())
        assert got == want and len(got) > 0

    def test_attr_eq_with_bbox(self, ray_session, tiny_fixtures, astore):
        from geomesa_ray.engine import GeoMesaRayEngine
        from geomesa_ray.pipelines.scan import SpatialQuery, exact_mask
        from geomesa_ray.planner import QuerySpec

        t = _store_table(astore, ["image_id", "caption", "lon", "lat",
                                  "dtg_s"])
        val = t.column("caption")[2].as_py()
        bbox = (-180.0, 180.0, -90.0, 90.0)
        spec = QuerySpec(attr_eq={"caption": val}, bbox=bbox)
        eng = GeoMesaRayEngine(tiny_fixtures, store_dir=astore)
        got = _ids(eng.query(spec))
        q = SpatialQuery(*bbox, None, None)
        m = exact_mask(q, t.column("lon").to_numpy(zero_copy_only=False),
                       t.column("lat").to_numpy(zero_copy_only=False),
                       t.column("dtg_s").to_numpy(zero_copy_only=False))
        want = sorted(t.filter(pa.array(
            m & (np.asarray(t.column("caption").to_pylist(),
                            dtype=object) == val)))
            .column("image_id").to_pylist())
        assert got == want

    def test_unindexed_column_falls_back_to_scan(self, ray_session,
                                                 tiny_fixtures, astore):
        from geomesa_ray.engine import GeoMesaRayEngine
        from geomesa_ray.planner import QuerySpec

        t = _store_table(astore, ["image_id", "phash"])
        val = t.column("phash")[0].as_py()
        eng = GeoMesaRayEngine(tiny_fixtures, store_dir=astore)
        got = _ids(eng.query(QuerySpec(attr_eq={"phash": val})))
        want = sorted(t.filter(pc.equal(t.column("phash"), val))
                      .column("image_id").to_pylist())
        assert got == want and len(got) > 0


class TestReviewFixes:
    def test_not_equal_falls_back_to_tree(self, ray_session,
                                          tiny_fixtures):
        """'<>' has no contiguous-range form: parse_cql must REJECT it
        (tree-grammar fallback evaluates real not-equal) — regression
        for the shadowed-regex bug that executed 'col <> N' as
        'col <= N'."""
        from geomesa_ray.cql import parse_cql
        from geomesa_ray.engine import GeoMesaRayEngine

        with pytest.raises(ValueError):
            parse_cql("phash <> 5")
        eng = GeoMesaRayEngine(tiny_fixtures)
        assert eng.cql("phash <> 5").count() == 6000  # nothing equals 5

    def test_eq_and_range_compose(self, astore):
        """eq + range on the same column AND together on the index path
        (regression: range silently dropped when eq was set)."""
        t = _store_table(astore, ["image_id", "week"])
        w = t.column("week").to_numpy(zero_copy_only=False)
        lo = int(np.min(w))
        # week = lo AND week > lo -> provably empty
        assert query_attr_index(astore, "week", eq=lo, lo=lo,
                                lo_strict=True).count() == 0
        # week = lo AND week >= lo -> exactly the eq set
        want = sorted(t.filter(pa.array(w == lo))
                      .column("image_id").to_pylist())
        got = _ids(query_attr_index(astore, "week", eq=lo, lo=lo))
        assert got == want and len(got) > 0

    def test_stale_index_falls_back_then_rebuild(self, ray_session,
                                                 tiny_fixtures, tmp_path):
        """After append_store the index is STALE: the engine must fall
        back to the scan (seeing appended rows), and a rebuild must
        wipe-and-reindex so the new rows are served (regression: resume
        skipped committed partitions and lost appended rows forever)."""
        import ray as _ray

        from geomesa_ray.engine import GeoMesaRayEngine
        from geomesa_ray.planner import QuerySpec
        from geomesa_ray.sources.fixtures import gen_images_table
        from geomesa_ray.state.attr_index import attr_index_current
        from geomesa_ray.state.store import append_store

        d = str(tmp_path / "store")
        write_store(tiny_fixtures, d)
        build_attr_index(d, "week", n_parts=4)
        assert attr_index_current(d, "week")

        # append brand-new rows (ids beyond the fixture range)
        extra = gen_images_table(6100).slice(6000, 100)
        append_store(d, extra)
        assert not attr_index_current(d, "week")

        import ray.data  # noqa: F401

        t = pa.concat_tables(_ray.get(
            read_store(d, columns=["image_id", "week"]).to_arrow_refs()))
        w = t.column("week").to_numpy(zero_copy_only=False)
        lo, hi = int(np.min(w)), int(np.max(w))
        want = sorted(t.column("image_id").to_pylist())
        assert len(want) == 6100

        eng = GeoMesaRayEngine(tiny_fixtures, store_dir=d)
        got = _ids(eng.query(QuerySpec(attr_range={"week": (lo, hi)})))
        assert got == want  # stale index bypassed -> appended rows seen

        build_attr_index(d, "week", n_parts=4)  # wipe-and-rebuild
        assert attr_index_current(d, "week")
        got2 = _ids(eng.query(QuerySpec(attr_range={"week": (lo, hi)})))
        assert got2 == want  # index path now serves appended rows too

    def test_all_null_column_clear_error(self, ray_session, tmp_path):
        from geomesa_ray.state.attr_index import _sample_boundaries

        p = str(tmp_path / "nulls.parquet")
        pq.write_table(pa.table({
            "c": pa.array([None, None, None], pa.string()),
            "image_id": pa.array(["a", "b", "c"])}), p)
        with pytest.raises(ValueError, match="no non-null values"):
            _sample_boundaries([p], "c", 4)
