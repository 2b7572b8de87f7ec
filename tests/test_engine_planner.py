"""Engine facade, strategy decider, record lookup, ingest/export tests."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.engine import GeoMesaRayEngine
from geomesa_ray.pipelines.scan import SpatialQuery, exact_mask
from geomesa_ray.planner import (
    QuerySpec,
    Strategy,
    choose_strategy,
    intersect_id_sets,
    record_lookup,
)
from geomesa_ray.sources.fixtures import gen_images_table
from geomesa_ray.stages.derive import phash_to_dtg_s, phash_to_lonlat


class TestStrategyDecider:
    def test_record_beats_everything(self):
        spec = QuerySpec(ids=["img00000001"], attr_eq={"fmt": "raw"},
                         bbox=(0, 1, 0, 1), interval_s=(0, 1))
        assert choose_strategy(spec) is Strategy.RECORD

    def test_attr_beats_spatial(self):
        spec = QuerySpec(attr_eq={"fmt": "raw"}, bbox=(0, 1, 0, 1),
                         interval_s=(0, 1))
        assert choose_strategy(spec) is Strategy.ATTRIBUTE

    def test_z3_vs_st(self):
        assert choose_strategy(QuerySpec(bbox=(0, 1, 0, 1),
                                         interval_s=(0, 1))) is Strategy.Z3
        assert choose_strategy(QuerySpec(bbox=(0, 1, 0, 1))) is Strategy.ST

    def test_override(self):
        spec = QuerySpec(ids=["a"])
        assert choose_strategy(spec, override=Strategy.ST) is Strategy.ST

    def test_id_intersection(self):
        spec = QuerySpec(ids=["a", "b", "c"], id_sets=[["b", "c", "d"], ["c", "b"]])
        assert intersect_id_sets(spec) == ["b", "c"]


class TestRecordLookup:
    def test_lookup(self, ray_session, tiny_fixtures):
        ids = ["img00000005", "img00000100", "img00005999"]
        rows = record_lookup(tiny_fixtures, ids).take_all()
        assert sorted(r["image_id"] for r in rows) == ids
        # caption payload intact
        ref = gen_images_table(6000)
        cap = dict(zip(ref.column("image_id").to_pylist(),
                       ref.column("caption").to_pylist()))
        assert all(r["caption"] == cap[r["image_id"]] for r in rows)


class TestEngineQuery:
    def test_combined_predicates_any_strategy(self, ray_session, tiny_fixtures):
        """All strategies must return the SAME rows for the same spec."""
        eng = GeoMesaRayEngine(tiny_fixtures)
        ref = gen_images_table(6000)
        ids = ref.column("image_id").to_pylist()[:500]
        q = SpatialQuery(-90.0, 90.0, -45.0, 45.0)
        spec = QuerySpec(ids=ids, bbox=(-90.0, 90.0, -45.0, 45.0))

        lon, lat = phash_to_lonlat(ref.column("phash").to_numpy())
        dtg = phash_to_dtg_s(ref.column("phash").to_numpy())
        m = exact_mask(q, lon, lat, dtg)
        want = {i for i, keep in zip(ref.column("image_id").to_pylist(), m)
                if keep and i in set(ids)}

        for override in [None, Strategy.ST]:
            got = {r["image_id"] for r in
                   eng.query(spec, strategy_override=override)
                   .select_columns(["image_id"]).take_all()}
            assert got == want, f"strategy={override}"

    def test_store_backed_query(self, ray_session, tiny_fixtures, tmp_path):
        eng = GeoMesaRayEngine(tiny_fixtures)
        eng.ingest_store(str(tmp_path / "store"))
        spec = QuerySpec(bbox=(-10.0, 25.0, -5.0, 30.0))
        got = {r["image_id"] for r in eng.query(spec)
               .select_columns(["image_id"]).take_all()}
        ref = gen_images_table(6000)
        lon, lat = phash_to_lonlat(ref.column("phash").to_numpy())
        dtg = phash_to_dtg_s(ref.column("phash").to_numpy())
        m = exact_mask(SpatialQuery(-10.0, 25.0, -5.0, 30.0), lon, lat, dtg)
        want = set(np.array(ref.column("image_id").to_pylist())[m].tolist())
        assert got == want

    def test_bbox_union(self, ray_session, tiny_fixtures):
        eng = GeoMesaRayEngine(tiny_fixtures)
        t = eng.bbox_union().to_pylist()[0]
        assert -180 <= t["lon_min"] < t["lon_max"] <= 180

    def test_sorted_export_ordering(self, ray_session, tiny_fixtures):
        eng = GeoMesaRayEngine(tiny_fixtures)
        rows = eng.sorted_export(SpatialQuery(-60.0, 60.0, -60.0, 60.0)) \
            .select_columns(["week", "z3"]).take_all()
        key = [(r["week"], r["z3"]) for r in rows]
        assert key == sorted(key)
        assert len(rows) > 100


class TestIngestExport:
    def test_csv_roundtrip(self, ray_session, tmp_path):
        import pandas as pd

        from geomesa_ray.sources.ingest import csv_ingest

        src = tmp_path / "in.csv"
        pd.DataFrame({"name": [" Alice ", "bob"], "x": [1.5, 2.5],
                      "y": [10.0, 20.0]}).to_csv(src, index=False)
        spec = {
            "name": ("trim", "col:name"),
            "name_up": ("uppercase", "col:name"),
            "geom": ("point_wkt", "col:x", "col:y"),
            "x2": ("multiply", "col:x", "col:x"),
        }
        rows = sorted(csv_ingest([str(src)], spec).take_all(),
                      key=lambda r: r["name"].lower())
        assert rows[0]["name"] == "Alice" and rows[0]["name_up"] == " ALICE "
        assert rows[0]["geom"] == "POINT (1.5 10)"
        assert rows[1]["x2"] == 6.25

    def test_json_ingest(self, ray_session, tmp_path):
        from geomesa_ray.sources.ingest import json_ingest

        src = tmp_path / "in.json"
        with open(src, "w") as f:
            f.write('{"a": "x", "n": 3}\n{"a": "y", "n": 4}\n')
        rows = sorted(json_ingest([str(src)], {"a": "col:a",
                                               "n2": ("add", "col:n", "col:n")})
                      .take_all(), key=lambda r: r["a"])
        assert rows[0]["n2"] == 6

    def test_geojson_export(self, ray_session, tiny_fixtures, tmp_path):
        import ray.data

        from geomesa_ray.sources.exports import export_geojson
        from geomesa_ray.sources.io import read_images
        from geomesa_ray.stages.derive import derive_geometry

        ds = read_images(tiny_fixtures, columns=["image_id", "phash"]) \
            .map_batches(derive_geometry, batch_format="pyarrow") \
            .select_columns(["image_id", "lon", "lat"]).limit(50)
        out = str(tmp_path / "gj")
        export_geojson(ds, out)
        feats = []
        for fn in os.listdir(out):
            with open(os.path.join(out, fn)) as f:
                for line in f:
                    if line.strip():
                        feats.append(json.loads(line))
        assert len(feats) == 50
        g = json.loads(feats[0]["feature"]) if "feature" in feats[0] else feats[0]
        assert g["type"] == "Feature" and g["geometry"]["type"] == "Point"

    def test_csv_export(self, ray_session, tiny_fixtures, tmp_path):
        from geomesa_ray.sources.exports import export_csv
        from geomesa_ray.sources.io import read_images

        out = str(tmp_path / "csv")
        export_csv(read_images(tiny_fixtures, columns=["image_id", "phash"])
                   .limit(10), out)
        assert any(f.endswith(".csv") for f in os.listdir(out))


class TestEmptyIdSet:
    def test_empty_intersection_returns_zero_rows(self, ray_session, tiny_fixtures):
        eng = GeoMesaRayEngine(tiny_fixtures)
        spec = QuerySpec(ids=["img00000010"], id_sets=[["img99999999"]])
        assert eng.query(spec).count() == 0

    def test_record_lookup_empty_ids(self, ray_session, tiny_fixtures):
        assert record_lookup(tiny_fixtures, []).count() == 0


class TestAttrStrategyAndLimit:
    def test_attribute_scan_path(self, ray_session, tiny_fixtures):
        eng = GeoMesaRayEngine(tiny_fixtures)
        spec = QuerySpec(attr_eq={"fmt": "raw"}, bbox=(-10.0, 25.0, -5.0, 30.0))
        assert choose_strategy(spec) is Strategy.ATTRIBUTE
        got = {r["image_id"] for r in eng.query(spec)
               .select_columns(["image_id"]).take_all()}
        ref = gen_images_table(6000)
        lon, lat = phash_to_lonlat(ref.column("phash").to_numpy())
        dtg = phash_to_dtg_s(ref.column("phash").to_numpy())
        m = exact_mask(SpatialQuery(-10.0, 25.0, -5.0, 30.0), lon, lat, dtg)
        want = set(np.array(ref.column("image_id").to_pylist())[m].tolist())
        assert got == want  # fmt='raw' matches everything; bbox refines

    def test_limit(self, ray_session, tiny_fixtures):
        eng = GeoMesaRayEngine(tiny_fixtures)
        assert eng.query(QuerySpec(), limit=7).count() == 7


class TestEngineIndexedFacade:
    def test_knn_indexed_and_append_via_engine(self, ray_session, tiny_fixtures,
                                               tmp_path):
        from geomesa_ray.sources.fixtures import gen_images_table_range

        eng = GeoMesaRayEngine(tiny_fixtures)
        with pytest.raises(ValueError):
            eng.knn_indexed()
        eng.ingest_store(str(tmp_path / "s"))
        out = eng.knn_indexed()
        assert len(out) > 0
        r = eng.append(gen_images_table_range(6000, 10))
        assert r["touched_buckets"] > 0


class TestGmlExport:
    def test_gml_fragments(self, ray_session, tiny_fixtures, tmp_path):
        import json as _json

        from geomesa_ray.sources.exports import export_gml
        from geomesa_ray.sources.io import read_images
        from geomesa_ray.stages.derive import derive_geometry

        ds = read_images(tiny_fixtures, columns=["image_id", "phash"]) \
            .map_batches(derive_geometry, batch_format="pyarrow") \
            .select_columns(["image_id", "lon", "lat"]).limit(5)
        out = str(tmp_path / "gml")
        export_gml(ds, out)
        frags = []
        for fn in os.listdir(out):
            with open(os.path.join(out, fn)) as f:
                for line in f:
                    if line.strip():
                        frags.append(_json.loads(line)["gml"])
        assert len(frags) == 5
        assert all("<gml:featureMember>" in g and "EPSG:4326" in g
                   for g in frags)


class TestRecordWithAttr:
    def test_record_strategy_with_attr_predicate(self, ray_session,
                                                 tiny_fixtures):
        """Regression: RECORD strategy + attr_eq must project the
        attribute column before refining."""
        eng = GeoMesaRayEngine(tiny_fixtures)
        spec = QuerySpec(ids=["img00000010", "img00000200"],
                         attr_eq={"fmt": "raw"})
        got = sorted(r["image_id"] for r in eng.query(spec)
                     .select_columns(["image_id"]).take_all())
        assert got == ["img00000010", "img00000200"]
        # non-matching attribute filters everything
        spec2 = QuerySpec(ids=["img00000010"], attr_eq={"fmt": "png"})
        assert eng.query(spec2).count() == 0


class TestQueryTimeout:
    def test_fast_query_returns(self, ray_session):
        import ray.data

        from geomesa_ray.util import take_all_with_timeout

        ds = ray.data.range(100).map_batches(lambda b: b)
        rows = take_all_with_timeout(ds, 60.0)
        assert len(rows) == 100

    def test_slow_query_times_out(self, ray_session):
        import time

        import ray.data

        from geomesa_ray.util import QueryTimeout, take_all_with_timeout

        def slow(b):
            time.sleep(10)
            return b

        ds = ray.data.range(8).map_batches(slow, batch_size=1)
        import pytest

        t0 = time.monotonic()
        with pytest.raises(QueryTimeout):
            take_all_with_timeout(ds, 1.0)
        assert time.monotonic() - t0 < 5.0  # the watchdog, not the query


class TestStoreConsistentSource:
    """Review r03: once a store is attached, EVERY strategy (attribute,
    record, CQL tree) must read it — equivalent CQL phrasings may not
    return different row sets after the store diverges from the fixture
    via append()."""

    def _store_eng(self, tiny_fixtures, tmp_path):
        from geomesa_ray.sources.fixtures import gen_images_table_range

        eng = GeoMesaRayEngine(tiny_fixtures)
        eng.ingest_store(
            str(tmp_path / "store"),
            columns=["image_id", "phash", "caption", "fmt"])
        appended = gen_images_table_range(6000, 300)
        eng.append(appended)
        new_ids = set(appended.column("image_id").to_pylist())
        return eng, new_ids

    def test_attribute_strategy_sees_appended_rows(
            self, ray_session, tiny_fixtures, tmp_path):
        eng, new_ids = self._store_eng(tiny_fixtures, tmp_path)
        spec = QuerySpec(attr_eq={"fmt": "raw"})
        assert choose_strategy(spec) is Strategy.ATTRIBUTE
        got = {r["image_id"] for r in eng.query(spec)
               .select_columns(["image_id"]).take_all()}
        assert new_ids <= got and len(got) == 6300

    def test_record_strategy_sees_appended_rows(
            self, ray_session, tiny_fixtures, tmp_path):
        eng, new_ids = self._store_eng(tiny_fixtures, tmp_path)
        probe = sorted(new_ids)[0]
        spec = QuerySpec(ids=[probe, "img00000007"])
        assert choose_strategy(spec) is Strategy.RECORD
        got = {r["image_id"] for r in eng.query(spec)
               .select_columns(["image_id"]).take_all()}
        assert got == {probe, "img00000007"}

    def test_planner_and_tree_phrasings_agree(
            self, ray_session, tiny_fixtures, tmp_path):
        """`fmt = 'raw'` (planner ATTRIBUTE) and `(fmt = 'raw')` (parens
        force the tree grammar) must scan the same source."""
        eng, new_ids = self._store_eng(tiny_fixtures, tmp_path)
        a = {r["image_id"] for r in eng.cql("fmt = 'raw'")
             .select_columns(["image_id"]).take_all()}
        b = {r["image_id"] for r in eng.cql("(fmt = 'raw')").take_all()}
        assert a == b and new_ids <= a

    def test_missing_store_column_is_clear_error(
            self, ray_session, tiny_fixtures, tmp_path):
        eng = GeoMesaRayEngine(tiny_fixtures)
        eng.ingest_store(str(tmp_path / "store"))  # no fmt ingested
        with pytest.raises(ValueError, match="not ingested"):
            eng.query(QuerySpec(attr_eq={"fmt": "raw"})).take_all()


class TestCoveredProjection:
    """Engine-level cost-based index coverage (AttributeIdxStrategy.scala:
    85-104): a query projection covered by the carried index value is
    served straight off the secondary index with NO record join."""

    def _indexed_eng(self, tiny_fixtures, tmp_path):
        from geomesa_ray.state.attr_index import build_attr_index
        from geomesa_ray.state.store import read_store

        eng = GeoMesaRayEngine(tiny_fixtures)
        eng.ingest_store(str(tmp_path / "store"))
        build_attr_index(eng.store_dir, "week", n_parts=4)
        wk = read_store(eng.store_dir, columns=["week"]).take_batch(
            1, batch_format="pyarrow")["week"][0].as_py()
        return eng, QuerySpec(attr_range={"week": (wk, wk)})

    @staticmethod
    def _by_id(rows):
        return {r["image_id"]: (r["lon"], r["lat"]) for r in rows}

    def test_covered_equals_join_path(self, ray_session, tiny_fixtures,
                                      tmp_path):
        eng, spec = self._indexed_eng(tiny_fixtures, tmp_path)
        assert choose_strategy(spec) is Strategy.ATTRIBUTE
        covered = eng.query(
            spec, columns=["image_id", "lon", "lat"]).take_all()
        joined = eng.query(spec).select_columns(
            ["image_id", "lon", "lat"]).take_all()
        assert covered and set(covered[0]) == {"image_id", "lon", "lat"}
        assert self._by_id(covered) == self._by_id(joined)

    def test_covered_path_never_opens_records(self, ray_session,
                                              tiny_fixtures, tmp_path):
        """Behavioral proof the join is skipped: replace every store
        record file with same-size garbage (fingerprint-invariant, so
        the index stays 'current'). The covered projection still answers
        exactly; the JOIN path must fail trying to read records."""
        eng, spec = self._indexed_eng(tiny_fixtures, tmp_path)
        covered_before = eng.query(
            spec, columns=["image_id", "lon", "lat"]).take_all()
        for p in os.listdir(eng.store_dir):
            if p.startswith("part="):
                f = os.path.join(eng.store_dir, p, "data.parquet")
                size = os.path.getsize(f)
                with open(f, "wb") as fh:
                    fh.write(b"\0" * size)
        covered = eng.query(
            spec, columns=["image_id", "lon", "lat"]).take_all()
        assert self._by_id(covered) == self._by_id(covered_before)
        with pytest.raises(Exception):
            eng.query(spec).take_all()

    def test_uncovered_projection_joins(self, ray_session, tiny_fixtures,
                                        tmp_path):
        """caption is NOT in the index value: the projection must come
        back through the record join, values byte-identical to the
        store rows."""
        from geomesa_ray.state.store import read_store

        eng, spec = self._indexed_eng(tiny_fixtures, tmp_path)
        rows = eng.query(
            spec, columns=["image_id", "caption"]).take_all()
        t = read_store(eng.store_dir,
                       columns=["image_id", "caption"]).to_arrow_refs()
        import ray as _ray

        want = {}
        for ref in t:
            tb = _ray.get(ref)
            for i in range(tb.num_rows):
                want[tb.column("image_id")[i].as_py()] = \
                    tb.column("caption")[i].as_py()
        assert rows and all(
            r["caption"] == want[r["image_id"]] for r in rows)


class TestProjectionOtherStrategies:
    """query(columns=...) applies the projection on EVERY strategy, not
    just the attribute-index path."""

    def test_spatial_strategy_projects(self, ray_session, tiny_fixtures):
        eng = GeoMesaRayEngine(tiny_fixtures)
        spec = QuerySpec(bbox=(-10.0, 25.0, -5.0, 30.0))
        full = eng.query(spec)
        proj = eng.query(spec, columns=["image_id", "lon", "lat"])
        assert set(proj.schema().names) == {"image_id", "lon", "lat"}
        want = {r["image_id"] for r in full.select_columns(
            ["image_id"]).take_all()}
        assert {r["image_id"] for r in proj.take_all()} == want and want

    def test_record_strategy_projects(self, ray_session, tiny_fixtures):
        eng = GeoMesaRayEngine(tiny_fixtures)
        spec = QuerySpec(ids=["img00000010", "img00000200"])
        proj = eng.query(spec, columns=["image_id", "caption"])
        rows = proj.take_all()
        assert {r["image_id"] for r in rows} == \
            {"img00000010", "img00000200"}
        assert set(rows[0]) == {"image_id", "caption"}
