"""Point2PointProcess parity tests (Point2PointProcess.scala:27-113):
brute-force Python oracle replicating the reference's group/sort/
day-break/sliding-pair/filter semantics, vs the bucketed vectorized
Ray pipeline."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from geomesa_ray.pipelines.point2point import (
    SECONDS_PER_DAY,
    build_segments,
    point2point,
)


def brute_segments(rows, min_points, break_on_day, filter_singular):
    """Reference semantics, row-at-a-time: rows = (id, track, t, lon, lat)."""
    from collections import defaultdict

    by_track = defaultdict(list)
    for r in rows:
        by_track[r[1]].append(r)
    out = []
    for track, obs in by_track.items():
        if not len(obs) > min_points:
            continue
        obs = sorted(obs, key=lambda r: (r[2], r[0]))
        if break_on_day:
            runs = defaultdict(list)
            for r in obs:
                runs[r[2] // SECONDS_PER_DAY].append(r)
            groups = [g for _, g in sorted(runs.items()) if len(g) >= 2]
        else:
            groups = [obs]
        for g in groups:
            for idx in range(len(g) - 1):
                a, b = g[idx], g[idx + 1]
                if filter_singular and a[3] == b[3] and a[4] == b[4]:
                    continue  # indexed first, filtered after (gaps remain)
                out.append((track, idx, a[2], b[2], a[3], a[4], b[3], b[4]))
    return sorted(out)


def run_pipeline(rows, **kw):
    t = pa.table({
        "image_id": pa.array([r[0] for r in rows], pa.string()),
        "track": pa.array([r[1] for r in rows], pa.int64()),
        "dtg_s": pa.array([r[2] for r in rows], pa.int64()),
        "lon": pa.array([r[3] for r in rows], pa.float64()),
        "lat": pa.array([r[4] for r in rows], pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    got = build_segments(ds, n_parts=8, **kw).take_all()
    return sorted((g["track"], g["seg_idx"], g["t_start"], g["t_end"],
                   g["x0"], g["y0"], g["x1"], g["y1"]) for g in got)


def synth_rows(n, n_tracks=7, seed=42):
    rng = np.random.default_rng(seed)
    t0 = 1704067200
    rows = []
    for i in range(n):
        rows.append((f"r{i:05d}", int(rng.integers(n_tracks)),
                     t0 + int(rng.integers(0, 5 * SECONDS_PER_DAY)),
                     float(rng.integers(-5, 5)),   # ints -> duplicate
                     float(rng.integers(-5, 5))))  # points do occur
    return rows


class TestPoint2Point:
    @pytest.mark.parametrize("break_on_day", [False, True])
    @pytest.mark.parametrize("filter_singular", [False, True])
    def test_matches_brute_force(self, ray_session, break_on_day,
                                 filter_singular):
        rows = synth_rows(400)
        want = brute_segments(rows, 3, break_on_day, filter_singular)
        got = run_pipeline(rows, min_points=3, break_on_day=break_on_day,
                           filter_singular=filter_singular)
        assert got == want and len(got) > 50

    def test_min_points_is_strict_total_count(self, ray_session):
        # 3 tracks with 2/3/4 points; min_points=3 keeps only the
        # 4-point track (strict >, counted before the day split)
        t0 = 1704067200
        rows = [("a0", 0, t0, 0.0, 0.0), ("a1", 0, t0 + 60, 1.0, 1.0),
                ("b0", 1, t0, 0.0, 0.0), ("b1", 1, t0 + 60, 1.0, 0.0),
                ("b2", 1, t0 + 120, 2.0, 0.0),
                ("c0", 2, t0, 0.0, 0.0), ("c1", 2, t0 + 60, 1.0, 0.0),
                ("c2", 2, t0 + 120, 2.0, 0.0),
                ("c3", 2, t0 + 180, 3.0, 0.0)]
        got = run_pipeline(rows, min_points=3)
        assert {g[0] for g in got} == {2}
        assert [g[1] for g in got] == [0, 1, 2]  # consecutive seg_idx

    def test_day_break_and_singular_gap(self, ray_session):
        """A day boundary splits the track; a singular pair keeps its
        index slot (gap), matching the reference's filter-after-index."""
        t0 = (1704067200 // SECONDS_PER_DAY) * SECONDS_PER_DAY
        rows = [
            ("a", 0, t0 + 100, 0.0, 0.0),
            ("b", 0, t0 + 200, 0.0, 0.0),   # singular pair with 'a'
            ("c", 0, t0 + 300, 1.0, 1.0),
            ("d", 0, t0 + SECONDS_PER_DAY + 100, 2.0, 2.0),  # next day
            ("e", 0, t0 + SECONDS_PER_DAY + 200, 3.0, 3.0),
        ]
        got = run_pipeline(rows, min_points=2, break_on_day=True,
                           filter_singular=True)
        # day 1: pair(a,b) singular -> dropped but holds idx 0;
        # pair(b,c) emitted with idx 1. day 2: pair(d,e) idx 0.
        assert [(g[1], g[2]) for g in got] == [(0, t0 + SECONDS_PER_DAY + 100),
                                              (1, t0 + 200)] or \
               sorted((g[1], g[2]) for g in got) == [
                   (0, t0 + SECONDS_PER_DAY + 100), (1, t0 + 200)]
        # no day-crossing segment
        assert all(g[2] // SECONDS_PER_DAY == g[3] // SECONDS_PER_DAY
                   for g in got)

    def test_tie_break_deterministic(self, ray_session):
        """Equal timestamps order by id — the distributed-deterministic
        replacement for the reference's stable-sort-by-input-order."""
        t0 = 1704067200
        rows = [("z", 0, t0, 0.0, 0.0), ("a", 0, t0, 1.0, 1.0),
                ("m", 0, t0 + 60, 2.0, 2.0)]
        got = run_pipeline(rows, min_points=2)
        assert [(g[4], g[6]) for g in got] == [(1.0, 0.0), (0.0, 2.0)]

    def test_image_corpus_query(self, ray_session, tiny_fixtures):
        got = point2point(tiny_fixtures, min_points=10).take_all()
        assert len(got) > 500
        tracks = {g["track"] for g in got}
        assert tracks <= set(range(256))
        assert all(g["t_start"] <= g["t_end"] for g in got)
