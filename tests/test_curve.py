"""Curve-kernel conformance tests (FIXTURES.md F5; mirrors the reference's
geomesa-z3 Z3Test / Z3RangeTest / MergeQueueTest coverage)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geomesa_ray.curve import (
    SECONDS_PER_WEEK,
    Z2Grid,
    Z3SFC,
    merge_ranges,
    lonlat_to_xy,
    time_to_week_t,
    z2_decode,
    z2_encode,
    z3_decode,
    z3_encode,
    zranges_2d,
    zranges_3d,
)
from geomesa_ray.curve.zorder import combine21, split21

U = np.uint64


class TestBitKernels:
    def test_split_combine_identity(self):
        xs = np.arange(0, 1 << 21, 997, dtype=U)
        assert (combine21(split21(xs)) == xs).all()

    def test_split_masks_high_bits(self):
        assert int(split21(np.uint64((1 << 21) | 5))) == int(split21(np.uint64(5)))

    def test_roundtrip_extremes(self):
        for x, y, t in [(0, 0, 0), ((1 << 21) - 1, (1 << 21) - 1, (1 << 20) - 1),
                        (1, 0, 0), (0, 1, 0), (0, 0, 1)]:
            z = z3_encode(np.uint64(x), np.uint64(y), np.uint64(t))
            xx, yy, tt = z3_decode(z)
            assert (int(xx), int(yy), int(tt)) == (x, y, t)

    def test_max_z3_fits_63_bits(self):
        z = z3_encode(np.uint64((1 << 21) - 1), np.uint64((1 << 21) - 1),
                      np.uint64((1 << 20) - 1))
        assert int(z) < (1 << 63)

    @given(st.integers(0, (1 << 21) - 1), st.integers(0, (1 << 21) - 1),
           st.integers(0, (1 << 20) - 1))
    @settings(max_examples=200, deadline=None)
    def test_roundtrip_property(self, x, y, t):
        z = z3_encode(np.uint64(x), np.uint64(y), np.uint64(t))
        xx, yy, tt = z3_decode(z)
        assert (int(xx), int(yy), int(tt)) == (x, y, t)

    def test_z2_roundtrip(self):
        rng = np.random.default_rng(7)
        x = rng.integers(0, 1 << 21, 5000).astype(U)
        y = rng.integers(0, 1 << 21, 5000).astype(U)
        a, b = z2_decode(z2_encode(x, y))
        assert (a == x).all() and (b == y).all()

    def test_ordering_locality(self):
        # adjacent x at same y/t differ only in low z bits
        z1 = z3_encode(np.uint64(100), np.uint64(200), np.uint64(300))
        z2 = z3_encode(np.uint64(101), np.uint64(200), np.uint64(300))
        assert int(z2) > int(z1)


class TestNormalization:
    def test_lonlat_bounds(self):
        ix, iy = lonlat_to_xy(np.array([-180.0, 0.0, 180.0]),
                              np.array([-90.0, 0.0, 90.0]))
        assert ix.tolist() == [0, 1 << 20, (1 << 21) - 1]
        assert iy.tolist() == [0, 1 << 20, (1 << 21) - 1]

    def test_week_math(self):
        # instants exactly at week boundaries (Z3Table.scala:48-51 parity)
        secs = np.array([0, SECONDS_PER_WEEK - 1, SECONDS_PER_WEEK,
                         SECONDS_PER_WEEK + 1], dtype=np.int64)
        week, it = time_to_week_t(secs)
        assert week.tolist() == [0, 0, 1, 1]
        assert it[0] == 0 and it[2] == 0
        assert int(it[1]) == ((SECONDS_PER_WEEK - 1) * (1 << 20)) // SECONDS_PER_WEEK

    def test_t_coord_fits_20_bits(self):
        secs = np.arange(0, SECONDS_PER_WEEK, 3571, dtype=np.int64)
        _, it = time_to_week_t(secs)
        assert int(it.max()) < (1 << 20)


class TestMergeRanges:
    def test_merge_overlap_and_adjacent(self):
        assert merge_ranges([(5, 10), (0, 3), (4, 6), (20, 30)]) == [(0, 10), (20, 30)]

    def test_merge_empty(self):
        assert merge_ranges([]) == []

    def test_merge_contained(self):
        assert merge_ranges([(0, 100), (10, 20)]) == [(0, 100)]


def _ranges_cover(ranges, zs):
    los = np.array([a for a, _ in ranges])
    his = np.array([b for _, b in ranges])
    idx = np.searchsorted(los, zs, "right") - 1
    return (idx >= 0) & (zs <= his[np.clip(idx, 0, len(his) - 1)])


class TestZRanges:
    def test_cover_random_boxes(self):
        rng = np.random.default_rng(3)
        for _ in range(10):
            ix0, iy0 = rng.integers(0, 1 << 20, 2)
            it0 = rng.integers(0, 1 << 19)
            ix1 = int(ix0) + int(rng.integers(1, 1 << 14))
            iy1 = int(iy0) + int(rng.integers(1, 1 << 14))
            it1 = min(int(it0) + int(rng.integers(1, 1 << 10)), (1 << 20) - 1)
            r = zranges_3d(int(ix0), ix1, int(iy0), iy1, int(it0), it1)
            assert r == merge_ranges(r)  # sorted + disjoint
            px = rng.integers(ix0, ix1 + 1, 3000).astype(U)
            py = rng.integers(iy0, iy1 + 1, 3000).astype(U)
            pt = rng.integers(it0, it1 + 1, 3000).astype(U)
            pz = z3_encode(px, py, pt).astype(np.int64)
            assert _ranges_cover(r, pz).all()

    def test_selectivity_not_degenerate(self):
        # a small box's covering ranges should not span the whole curve
        r = zranges_3d(1000, 1100, 2000, 2100, 5000, 5100)
        total = sum(hi - lo + 1 for lo, hi in r)
        assert total < (1 << 40)

    def test_2d_cover(self):
        rng = np.random.default_rng(4)
        level = 12
        ix0, iy0 = 100, 200
        ix1, iy1 = 400, 260
        r = zranges_2d(ix0, ix1, iy0, iy1, level)
        px = rng.integers(ix0, ix1 + 1, 2000).astype(U)
        py = rng.integers(iy0, iy1 + 1, 2000).astype(U)
        pz = z2_encode(px, py).astype(np.int64)
        assert _ranges_cover(r, pz).all()


class TestZ2Grid:
    def test_hierarchy_prefix_property(self):
        g12 = Z2Grid(12)
        g8 = Z2Grid(8)
        lon = np.array([12.34, -77.1, 179.99])
        lat = np.array([45.6, -12.0, -89.9])
        c12 = g12.encode(lon, lat)
        c8 = g8.encode(lon, lat)
        assert (np.asarray(c12) >> 8 == np.asarray(c8)).all()

    def test_cell_bounds_contain_point(self):
        g = Z2Grid(12)
        lon = np.array([12.34, -77.1])
        lat = np.array([45.6, -12.0])
        c = g.encode(lon, lat)
        lon0, lon1, lat0, lat1 = g.cell_bounds(c)
        assert ((lon >= lon0) & (lon < lon1) & (lat >= lat0) & (lat < lat1)).all()

    def test_bbox_cells_cover(self):
        g = Z2Grid(10)
        cells = g.bbox_cells(10.0, 12.0, 40.0, 41.0)
        pts_lon = np.linspace(10.0, 12.0, 50)
        pts_lat = np.linspace(40.0, 41.0, 50)
        pc = g.encode(pts_lon, pts_lat)
        assert np.isin(np.asarray(pc), np.asarray(cells)).all()


class TestZ3SFC:
    def test_index_deterministic(self):
        sfc = Z3SFC()
        lon = np.array([0.0, 10.0])
        lat = np.array([0.0, 20.0])
        secs = np.array([1704067200, 1704067200 + 86400], dtype=np.int64)
        w1, z1 = sfc.index(lon, lat, secs)
        w2, z2 = sfc.index(lon, lat, secs)
        assert (np.asarray(w1) == np.asarray(w2)).all()
        assert (np.asarray(z1) == np.asarray(z2)).all()
        assert (np.asarray(z1) >= 0).all()


class TestPlannerFuzz:
    def test_100_random_boxes_coarse_covers_exact(self):
        """Planner fuzz (pure numpy, no Ray): for 100 random spatio-
        temporal boxes, the coarse z-range mask must be a superset of the
        exact mask over a 20k-point corpus."""
        from geomesa_ray.pipelines.scan import (SpatialQuery, coarse_mask,
                                                exact_mask, plan_query)
        from geomesa_ray.sources.fixtures import (DTG_BASE_S, DTG_SPAN_S,
                                                  gen_images_table)
        from geomesa_ray.stages.encode import derive_and_encode

        t = derive_and_encode(gen_images_table(20000))
        week = t.column("week").to_numpy()
        z3 = t.column("z3").to_numpy()
        lon = t.column("lon").to_numpy()
        lat = t.column("lat").to_numpy()
        dtg = t.column("dtg_s").to_numpy()
        rng = np.random.default_rng(99)
        for i in range(100):
            x0 = rng.uniform(-180, 179)
            y0 = rng.uniform(-90, 89)
            w = rng.uniform(0.01, 60)
            h = rng.uniform(0.01, 40)
            if rng.random() < 0.3:
                ts, te = None, None
            else:
                ts = DTG_BASE_S + int(rng.integers(0, DTG_SPAN_S))
                te = min(ts + int(rng.integers(60, DTG_SPAN_S)),
                         DTG_BASE_S + DTG_SPAN_S)
            q = SpatialQuery(x0, min(x0 + w, 180.0), y0, min(y0 + h, 90.0),
                             ts, te)
            cm = coarse_mask(plan_query(q), week, z3)
            em = exact_mask(q, lon, lat, dtg)
            dropped = int((em & ~cm).sum())
            assert dropped == 0, f"box {i}: coarse dropped {dropped} rows ({q})"


class TestZdiv:
    """On-the-fly LITMAX/BIGMIN vs brute force over the full z-space
    (Z3.scala:181-232 zdiv semantics)."""

    @staticmethod
    def _brute(zval, box_lo, box_hi, dims, bits, decode):
        per_dim = bits // dims
        in_box = []
        for z in range(1 << bits):
            coords = decode(z)
            if all(box_lo[d] <= coords[d] <= box_hi[d] for d in range(dims)):
                in_box.append(z)
        lit = max((z for z in in_box if z < zval), default=None)
        big = min((z for z in in_box if z > zval), default=None)
        return lit, big

    def test_2d_bruteforce(self):
        import itertools
        from geomesa_ray.curve.zorder import z2_decode, z2_encode, zdiv

        bits = 12  # 6 bits per dim -> 4096 z values
        def decode(z):
            x, y = z2_decode(np.uint64(z))
            return int(x), int(y)

        rng = np.random.default_rng(3)
        for _ in range(12):
            x0, x1 = sorted(rng.integers(0, 64, 2).tolist())
            y0, y1 = sorted(rng.integers(0, 64, 2).tolist())
            rmin = int(z2_encode(np.uint64(x0), np.uint64(y0)))
            rmax = int(z2_encode(np.uint64(x1), np.uint64(y1)))
            for zval in rng.integers(rmin, rmax + 1, 8).tolist():
                x, y = decode(zval)
                if x0 <= x <= x1 and y0 <= y <= y1:
                    continue  # zdiv contract: seek value outside the box
                lit, big = zdiv(zval, rmin, rmax, dims=2, total_bits=bits)
                blit, bbig = self._brute(zval, (x0, y0), (x1, y1), 2,
                                         bits, decode)
                assert big == bbig, (zval, x0, x1, y0, y1)
                assert lit == blit, (zval, x0, x1, y0, y1)

    def test_3d_bruteforce(self):
        from geomesa_ray.curve.zorder import z3_encode, z3_decode, zdiv

        bits = 12  # 4 bits per dim
        def decode(z):
            x, y, t = z3_decode(np.uint64(z))
            return int(x), int(y), int(t)

        rng = np.random.default_rng(5)
        for _ in range(8):
            lo = rng.integers(0, 16, 3)
            hi = np.minimum(lo + rng.integers(1, 8, 3), 15)
            rmin = int(z3_encode(*(np.uint64(v) for v in lo)))
            rmax = int(z3_encode(*(np.uint64(v) for v in hi)))
            for zval in rng.integers(rmin, rmax + 1, 6).tolist():
                c = decode(zval)
                if all(lo[d] <= c[d] <= hi[d] for d in range(3)):
                    continue
                lit, big = zdiv(zval, rmin, rmax, dims=3, total_bits=bits)
                blit, bbig = self._brute(zval, lo.tolist(), hi.tolist(), 3,
                                         bits, decode)
                assert big == bbig and lit == blit

    def test_bigmin_consistent_with_seek_skip(self):
        """zdiv's BIGMIN == the plan-time merged-range seek (the two
        implementations of the same reference semantic must agree)."""
        from geomesa_ray.curve.sfc import merge_ranges
        from geomesa_ray.curve.zorder import z2_decode, z2_encode, seek_skip, zdiv

        bits = 12
        x0, x1, y0, y1 = 10, 40, 5, 25
        rmin = int(z2_encode(np.uint64(x0), np.uint64(y0)))
        rmax = int(z2_encode(np.uint64(x1), np.uint64(y1)))
        zs = []
        for z in range(1 << bits):
            x, y = z2_decode(np.uint64(z))
            if x0 <= int(x) <= x1 and y0 <= int(y) <= y1:
                zs.append(z)
        zs = np.array(sorted(zs), dtype=np.int64)
        # exact covering ranges from the in-box set
        breaks = np.nonzero(np.diff(zs) > 1)[0]
        lo = np.concatenate([[zs[0]], zs[breaks + 1]])
        hi = np.concatenate([zs[breaks], [zs[-1]]])
        merged = merge_ranges(list(zip(lo.tolist(), hi.tolist())))
        lo = np.array([r[0] for r in merged], dtype=np.int64)
        hi = np.array([r[1] for r in merged], dtype=np.int64)
        rng = np.random.default_rng(9)
        for zval in rng.integers(rmin, rmax + 1, 40).tolist():
            x, y = z2_decode(np.uint64(zval))
            if x0 <= int(x) <= x1 and y0 <= int(y) <= y1:
                continue
            _, big = zdiv(zval, rmin, rmax, dims=2, total_bits=bits)
            via_ranges = seek_skip(lo, hi, zval + 1)
            assert big == via_ranges


class TestXZ2:
    """XZ2 extent index: candidate superset guarantee + real pruning."""

    def test_candidates_superset_of_intersecting(self):
        from geomesa_ray.curve.xz2 import (
            xz2_candidate_mask,
            xz2_encode,
            xz2_query_ranges,
        )

        rng = np.random.default_rng(11)
        n = 5000
        cx = rng.uniform(-179, 179, n)
        cy = rng.uniform(-89, 89, n)
        hw = rng.uniform(0.01, 12.0, n)
        hh = rng.uniform(0.01, 8.0, n)
        lon_min, lon_max = cx - hw, cx + hw
        lat_min, lat_max = cy - hh, cy + hh
        level, cell = xz2_encode(lon_min, lon_max, lat_min, lat_max)
        for _ in range(8):
            q0 = rng.uniform(-170, 150)
            q2 = rng.uniform(-80, 60)
            q1 = q0 + rng.uniform(1, 30)
            q3 = q2 + rng.uniform(1, 20)
            plan = xz2_query_ranges(q0, q1, q2, q3)
            coarse = xz2_candidate_mask(level, cell, plan)
            truth = ((lon_min <= q1) & (q0 <= lon_max)
                     & (lat_min <= q3) & (q2 <= lat_max))
            missed = truth & ~coarse
            assert not missed.any(), f"lost {missed.sum()} true hits"

    def test_pruning_is_effective(self):
        from geomesa_ray.curve.xz2 import (
            xz2_candidate_mask,
            xz2_encode,
            xz2_query_ranges,
        )

        rng = np.random.default_rng(12)
        n = 5000
        cx = rng.uniform(-179, 179, n)
        cy = rng.uniform(-89, 89, n)
        lon_min, lon_max = cx - 0.5, cx + 0.5
        lat_min, lat_max = cy - 0.5, cy + 0.5
        level, cell = xz2_encode(lon_min, lon_max, lat_min, lat_max)
        plan = xz2_query_ranges(-10.0, 25.0, -5.0, 30.0)
        coarse = xz2_candidate_mask(level, cell, plan)
        # a small query against small global extents must prune hard
        assert coarse.mean() < 0.2

    def test_level_monotone_in_size(self):
        from geomesa_ray.curve.xz2 import xz2_level

        lv = xz2_level(np.array([360.0, 22.5, 0.01]),
                       np.array([180.0, 11.25, 0.01]))
        assert lv[0] == 0 and lv[1] == 4 and lv[2] == 12  # capped


class TestXZ2Store:
    def test_store_query_matches_scan_and_prunes(self, ray_session,
                                                 tiny_fixtures, tmp_path):
        from geomesa_ray.pipelines.extent import (
            read_extent_store,
            write_extent_store,
            xz2_extent_query,
        )

        store = str(tmp_path / "xz2store")
        stats = write_extent_store(tiny_fixtures, store)
        assert stats["rows"] == 6000 and stats["partitions"] > 1
        qbox = (-10.0, 25.0, -5.0, 30.0)
        ds, n_read, n_total = read_extent_store(store, qbox)
        got = {r["image_id"] for r in ds.take_all()}
        want = {r["image_id"]
                for r in xz2_extent_query(tiny_fixtures, qbox).take_all()}
        assert got == want and got
        assert 0 < n_read < n_total  # genuinely pruned

    def test_partition_layout_is_parallelism_independent(self, ray_session,
                                                         tiny_fixtures,
                                                         tmp_path):
        """Different shuffle parallelism (block counts) must produce
        BYTE-identical partitions — the layout and row order are pure
        functions of the data (total sort key incl. image_id)."""
        import hashlib
        import os

        from geomesa_ray.pipelines.extent import write_extent_store
        from geomesa_ray.state.manifest import completed_partitions

        a = str(tmp_path / "xa")
        b = str(tmp_path / "xb")
        write_extent_store(tiny_fixtures, a, override_num_blocks=3)
        write_extent_store(tiny_fixtures, b, override_num_blocks=13)
        ma = {k: v["rows"] for k, v in completed_partitions(a).items()}
        mb = {k: v["rows"] for k, v in completed_partitions(b).items()}
        assert ma == mb

        def digest(d):
            out = {}
            for name in sorted(os.listdir(d)):
                if name.startswith("part="):
                    with open(os.path.join(d, name, "data.parquet"),
                              "rb") as f:
                        out[name] = hashlib.md5(f.read()).hexdigest()
            return out

        assert digest(a) == digest(b)

    def test_scheme_guard_and_resume(self, ray_session, tiny_fixtures,
                                     tmp_path):
        import pytest

        from geomesa_ray.pipelines.extent import write_extent_store

        store = str(tmp_path / "xguard")
        write_extent_store(tiny_fixtures, store)
        # same scheme re-run: resume no-op (all partitions committed)
        stats = write_extent_store(tiny_fixtures, store)
        assert stats["rows"] == 6000
        # different scheme into the same dir must refuse
        with pytest.raises(ValueError):
            write_extent_store(tiny_fixtures, store, prefix_level=2)

    def test_user_geometry_table_store(self, ray_session, tmp_path):
        """User-supplied WKT geometries (the reference's line/polygon
        XZ2 ingest) index and query through the same store machinery."""
        import numpy as np
        import pyarrow as pa

        import ray.data
        from geomesa_ray.pipelines.extent import (
            read_extent_store,
            wkt_envelopes,
            write_extent_store,
        )

        # deterministic mixed-geometry table spread over the globe
        rows = []
        for i in range(300):
            cx = -170.0 + (i * 37) % 340
            cy = -80.0 + (i * 53) % 160
            w, h = 1.0 + (i % 7), 0.5 + (i % 5)
            if i % 3 == 0:
                wkt = (f"POLYGON (({cx} {cy}, {cx + w} {cy}, "
                       f"{cx + w} {cy + h}, {cx} {cy + h}, {cx} {cy}))")
            elif i % 3 == 1:
                wkt = (f"MULTIPOLYGON ((({cx} {cy}, {cx + w} {cy}, "
                       f"{cx + w} {cy + h}, {cx} {cy})), "
                       f"(({cx - w} {cy - h}, {cx} {cy - h}, "
                       f"{cx} {cy}, {cx - w} {cy - h})))")
            else:
                wkt = f"LINESTRING ({cx} {cy}, {cx + w} {cy + h})"
            rows.append((f"g{i:04d}", wkt))
        t = pa.table({"region_id": pa.array([r[0] for r in rows]),
                      "wkt": pa.array([r[1] for r in rows])})
        env = wkt_envelopes(t)
        store = str(tmp_path / "userxz2")
        ext_ds = ray.data.from_arrow(env).repartition(4)
        stats = write_extent_store("", store, extents=ext_ds)
        assert stats["rows"] == 300
        qbox = (-30.0, 40.0, -20.0, 25.0)
        ds, n_read, n_total = read_extent_store(store, qbox)
        got = {r["image_id"] for r in ds.take_all()}
        x0 = env.column("lon_min").to_numpy()
        x1 = env.column("lon_max").to_numpy()
        y0 = env.column("lat_min").to_numpy()
        y1 = env.column("lat_max").to_numpy()
        hit = (x0 <= qbox[1]) & (qbox[0] <= x1) \
            & (y0 <= qbox[3]) & (qbox[2] <= y1)
        want = {i for i, h in zip(env.column("image_id").to_pylist(), hit)
                if h}
        assert got == want and got
        assert 0 < n_read < n_total  # pruning applies to user tables too


class TestGeoHash:
    """Canonical base32 GeoHash (GeoHash.scala byte-format parity):
    classic public vectors, an independent scalar bisection oracle, the
    prefix-hierarchy property, and exact bounds round-trip."""

    def test_classic_vectors(self):
        from geomesa_ray.curve.geohash import geohash_decode, geohash_encode

        got = geohash_encode(np.array([10.40744]), np.array([57.64911]), 11)
        assert got[0] == "u4pruydqqvj"
        assert geohash_encode(np.array([-5.6]), np.array([42.6]), 5)[0] \
            == "ezs42"
        lon, lat = geohash_decode(np.array(["ezs42"]))
        assert abs(lon[0] - -5.60302734375) < 1e-12
        assert abs(lat[0] - 42.60498046875) < 1e-12

    @staticmethod
    def _ref(lon, lat, precision):
        """Independent scalar oracle: the canonical alternating-bisection
        algorithm (no shared code with the vectorized kernel)."""
        alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
        lo_x, hi_x, lo_y, hi_y = -180.0, 180.0, -90.0, 90.0
        bits, even = [], True
        while len(bits) < 5 * precision:
            if even:
                mid = (lo_x + hi_x) / 2
                bits.append(1 if lon >= mid else 0)
                lo_x, hi_x = (mid, hi_x) if lon >= mid else (lo_x, mid)
            else:
                mid = (lo_y + hi_y) / 2
                bits.append(1 if lat >= mid else 0)
                lo_y, hi_y = (mid, hi_y) if lat >= mid else (lo_y, mid)
            even = not even
        return "".join(alpha[int("".join(map(str, bits[5 * i:5 * i + 5])), 2)]
                       for i in range(precision))

    def test_matches_scalar_bisection_oracle(self):
        from geomesa_ray.curve.geohash import geohash_encode

        rng = np.random.default_rng(42)
        lon = rng.uniform(-180, 180, 200)
        lat = rng.uniform(-90, 90, 200)
        for p in (1, 2, 5, 9, 12):
            got = geohash_encode(lon, lat, p)
            for i in range(len(lon)):
                assert got[i] == self._ref(lon[i], lat[i], p), (i, p)

    def test_bounds_contain_and_prefix_hierarchy(self):
        from geomesa_ray.curve.geohash import geohash_bounds, geohash_encode

        rng = np.random.default_rng(3)
        lon = rng.uniform(-180, 180, 2000)
        lat = rng.uniform(-90, 90, 2000)
        prev = None
        for p in range(1, 13):
            h = geohash_encode(lon, lat, p)
            b = geohash_bounds(h)
            assert (b["lon_min"] <= lon).all() and (lon < b["lon_max"]).all()
            assert (b["lat_min"] <= lat).all() and (lat < b["lat_max"]).all()
            if prev is not None:  # each hash extends its parent
                assert all(x.startswith(y) for x, y in zip(h, prev))
            prev = h

    def test_edge_clamp_and_invalid(self):
        from geomesa_ray.curve.geohash import geohash_bounds, geohash_encode

        h = geohash_encode(np.array([180.0, -180.0, 0.0]),
                           np.array([90.0, -90.0, 0.0]), 9)
        assert h[0] == "z" * 9 and h[1] == "0" * 9
        with pytest.raises(ValueError, match="invalid geohash"):
            geohash_bounds(np.array(["ezs4a"]))  # 'a' not in alphabet
        with pytest.raises(ValueError, match="precision"):
            geohash_encode(np.array([0.0]), np.array([0.0]), 13)

    def test_registry_function(self):
        import pyarrow as pa

        from geomesa_ray.functions.registry import transform_batch

        batch = pa.table({"x": pa.array([10.40744]),
                          "y": pa.array([57.64911])})
        out = transform_batch(batch, {
            "gh": ("geohash", "col:x", "col:y", 11)})
        assert out.column("gh")[0].as_py() == "u4pruydqqvj"
