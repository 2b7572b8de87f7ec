"""Visibility labels + authorizations (reference: geomesa-security
AuthorizationsProvider; per-feature visibilities in
AccumuloFeatureWriter.scala:63-96) — grammar, vectorized mask, and the
store read-path integration."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geomesa_ray.state.security import (
    evaluate_visibility,
    parse_visibility,
    visibility_mask,
)

VIS_CYCLE = ["", "admin", "admin&fr", "fr|us", "(admin|ops)&fr", "us"]


class TestGrammar:
    def test_label_and_or_parens(self):
        assert evaluate_visibility("admin", {"admin"})
        assert not evaluate_visibility("admin", {"fr"})
        assert evaluate_visibility("admin&fr", {"admin", "fr"})
        assert not evaluate_visibility("admin&fr", {"admin"})
        assert evaluate_visibility("fr|us", {"us"})
        assert evaluate_visibility("(admin|ops)&fr", {"ops", "fr"})
        assert not evaluate_visibility("(admin|ops)&fr", {"ops", "us"})

    def test_empty_is_public(self):
        assert evaluate_visibility("", set())
        assert evaluate_visibility(None, set())

    def test_mixed_operators_require_parens(self):
        # Accumulo ColumnVisibility rejects a&b|c — so do we
        with pytest.raises(ValueError):
            parse_visibility("a&b|c")
        # parenthesized versions parse fine
        assert evaluate_visibility("(a&b)|c", {"c"})
        assert evaluate_visibility("a&(b|c)", {"a", "c"})

    def test_malformed(self):
        for bad in ["(a", "a)", "a&&b", "&a", "a&", "a b"]:
            with pytest.raises(ValueError):
                parse_visibility(bad)

    def test_nested_depth(self):
        assert evaluate_visibility("((a|b)&(c|d))|e", {"b", "d"})
        assert not evaluate_visibility("((a|b)&(c|d))|e", {"b"})


class TestMask:
    def test_matches_scalar_oracle_with_nulls(self):
        rng = np.random.default_rng(7)
        vis = [None if i % 11 == 10 else VIS_CYCLE[i % len(VIS_CYCLE)]
               for i in range(500)]
        col = pa.array(vis, pa.string())
        for auths in [set(), {"admin"}, {"fr"}, {"admin", "fr"},
                      {"us", "ops", "fr"}]:
            got = visibility_mask(col, auths)
            want = np.array([v is None or evaluate_visibility(v, auths)
                             for v in vis])
            assert (got == want).all(), auths

    def test_malformed_expression_hides_row_not_task(self):
        """One corrupt label must not wedge the whole secured read:
        Accumulo treats an unparseable visibility as not visible. The
        malformed row disappears; every other row keeps its verdict."""
        vis = ["admin", "admin&fr|us", "fr|us", "(admin", "", None]
        col = pa.array(vis, pa.string())
        got = visibility_mask(col, {"admin", "fr", "us"})
        assert got.tolist() == [True, False, True, False, True, True]


class TestStoreIntegration:
    def _secured_fixture(self, tmp_path):
        from geomesa_ray.sources.fixtures import gen_images_table

        t = gen_images_table(2000)
        vis = pa.array([VIS_CYCLE[i % len(VIS_CYCLE)]
                        for i in range(t.num_rows)], pa.string())
        t = t.append_column("vis", vis)
        fdir = str(tmp_path / "secured_fixture")
        os.makedirs(fdir, exist_ok=True)
        pq.write_table(t, os.path.join(fdir, "images.parquet"))
        return fdir, t

    def test_read_store_filters_by_auths(self, ray_session, tmp_path):
        from geomesa_ray.state.store import read_store, write_store

        fdir, t = self._secured_fixture(tmp_path)
        store = str(tmp_path / "store")
        write_store(fdir, store,
                    columns=["image_id", "phash", "vis"])
        ids = t.column("image_id").to_pylist()
        vis = t.column("vis").to_pylist()

        def expect(auths):
            return {i for i, v in zip(ids, vis)
                    if evaluate_visibility(v, set(auths))}

        # superuser path: no filtering at all
        got_all = {r["image_id"] for r in read_store(store).take_all()}
        assert got_all == set(ids)
        # public only
        got_pub = {r["image_id"]
                   for r in read_store(store, auths=[]).take_all()}
        assert got_pub == expect([]) and got_pub < got_all
        # label sets see exactly their rows
        for auths in [["admin"], ["fr"], ["admin", "fr"], ["us"],
                      ["ops", "fr"]]:
            got = {r["image_id"]
                   for r in read_store(store, auths=auths).take_all()}
            assert got == expect(auths), auths
            assert got_pub <= got  # public rows always included

    def test_auths_compose_with_spatial_query(self, ray_session, tmp_path):
        from geomesa_ray.pipelines.scan import SpatialQuery
        from geomesa_ray.state.store import read_store, write_store

        fdir, t = self._secured_fixture(tmp_path)
        store = str(tmp_path / "store")
        write_store(fdir, store, columns=["image_id", "phash", "vis"])
        q = SpatialQuery(-60.0, 60.0, -60.0, 60.0)
        spatial = {r["image_id"]
                   for r in read_store(store, q).take_all()}
        secured = {r["image_id"]
                   for r in read_store(store, q, auths=["admin"]).take_all()}
        assert secured < spatial
        vis = dict(zip(t.column("image_id").to_pylist(),
                       t.column("vis").to_pylist()))
        assert secured == {i for i in spatial
                           if evaluate_visibility(vis[i], {"admin"})}

    def test_projection_keeps_vis_when_auths_given(self, ray_session,
                                                   tmp_path):
        from geomesa_ray.state.store import read_store, write_store

        fdir, t = self._secured_fixture(tmp_path)
        store = str(tmp_path / "store")
        write_store(fdir, store, columns=["image_id", "phash", "vis"])
        rows = read_store(store, columns=["image_id"],
                          auths=["admin"]).take_all()
        vis = dict(zip(t.column("image_id").to_pylist(),
                       t.column("vis").to_pylist()))
        assert rows and all(
            evaluate_visibility(vis[r["image_id"]], {"admin"})
            for r in rows)
        # the caller's exact projection is restored after filtering —
        # the vis expressions must not leak downstream
        assert set(rows[0].keys()) == {"image_id"}
