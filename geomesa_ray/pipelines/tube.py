"""Tube select: spatio-temporal corridor join around a track.

Reference parity: ``TubeSelectProcess`` builds a "tube" from a track —
transform -> buffer -> time-bin (maxBins) -> per-bin geometry union
(NoGapFill) or line-interpolated gap filling (LineGapFill) — then queries
each tube bin with geometry AND time intersection
(``process/tube/TubeBuilder.scala:30-185``, ``TubeSelectProcess.scala:32-60``),
de-duplicating the unioned results (``UniqueMultiCollection``).

Ray-Data shape: tube construction is a tiny driver-side prep (sort by
time, equal-count binning, box-buffer union per bin); the per-bin query
is ONE broadcast PIP join against the bin table (each bin is a region row
with its own time interval) — no per-bin scan loop. Geometry semantics:
box-buffer per bin (documented simplification of the circular buffer;
exactly mirrored by the SQL oracle). ``gap_fill="line"`` adds bridging
boxes between consecutive bins (LineGapFill role).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from geomesa_ray.pipelines.pip_join import pip_join_points
from geomesa_ray.sources.io import read_images
from geomesa_ray.stages.encode import derive_and_encode


def build_tube_bins(track_lon, track_lat, track_t_s, buffer_deg: float,
                    max_bins: int = 8, gap_fill: str = "none") -> pa.Table:
    """Track -> bin table (bin_id, lon/lat bbox, t_start, t_end)."""
    lon = np.asarray(track_lon, dtype=np.float64)
    lat = np.asarray(track_lat, dtype=np.float64)
    t = np.asarray(track_t_s, dtype=np.int64)
    order = np.argsort(t, kind="stable")
    lon, lat, t = lon[order], lat[order], t[order]
    n = len(t)
    nbins = min(max_bins, n)
    bin_of = (np.arange(n) * nbins) // n

    rows = []
    for b in range(nbins):
        m = bin_of == b
        rows.append(dict(
            region_id=f"bin{b:03d}", kind="box",
            lon_min=float(lon[m].min() - buffer_deg),
            lon_max=float(lon[m].max() + buffer_deg),
            lat_min=float(lat[m].min() - buffer_deg),
            lat_max=float(lat[m].max() + buffer_deg),
            wkt="",
            t_start=int(t[m].min()) * 1_000_000,
            t_end=int(t[m].max()) * 1_000_000,
        ))
    if gap_fill == "line":
        # bridging boxes between consecutive bins (LineGapFill role)
        for b in range(nbins - 1):
            i_last = np.nonzero(bin_of == b)[0][-1]
            i_next = np.nonzero(bin_of == b + 1)[0][0]
            rows.append(dict(
                region_id=f"gap{b:03d}", kind="box",
                lon_min=float(min(lon[i_last], lon[i_next]) - buffer_deg),
                lon_max=float(max(lon[i_last], lon[i_next]) + buffer_deg),
                lat_min=float(min(lat[i_last], lat[i_next]) - buffer_deg),
                lat_max=float(max(lat[i_last], lat[i_next]) + buffer_deg),
                wkt="",
                t_start=int(t[i_last]) * 1_000_000,
                t_end=int(t[i_next]) * 1_000_000,
            ))
    return pa.table({
        "region_id": pa.array([r["region_id"] for r in rows], pa.string()),
        "kind": pa.array([r["kind"] for r in rows], pa.string()),
        "lon_min": pa.array([r["lon_min"] for r in rows]),
        "lon_max": pa.array([r["lon_max"] for r in rows]),
        "lat_min": pa.array([r["lat_min"] for r in rows]),
        "lat_max": pa.array([r["lat_max"] for r in rows]),
        "wkt": pa.array([r["wkt"] for r in rows], pa.string()),
        "t_start": pa.array([r["t_start"] for r in rows], pa.timestamp("us")),
        "t_end": pa.array([r["t_end"] for r in rows], pa.timestamp("us")),
    })


def default_track(fixture_dir: str, n_points: int = 12):
    """Deterministic demo track: the first probes, hourly spacing."""
    import os

    import pyarrow.parquet as pq

    from geomesa_ray.sources.fixtures import DTG_BASE_S

    probes = pq.read_table(os.path.join(fixture_dir, "probes.parquet"))
    lon = probes.column("lon").to_numpy()[4:4 + n_points]
    lat = probes.column("lat").to_numpy()[4:4 + n_points]
    t = DTG_BASE_S + np.arange(n_points, dtype=np.int64) * 86_400 * 2
    return lon, lat, t


def tube_select_geodesic(fixture_dir: str, track_lon=None, track_lat=None,
                         track_t_s=None, buffer_m: float = 500_000.0,
                         max_bins: int = 8) -> ray.data.Dataset:
    """(image_id, bin_id) with the reference's REAL circular buffer
    semantics (``TubeBuilder.scala:30-185`` buffers the track geometry by
    d meters; NoGapFill buffers the bin's track POINTS): a point is in a
    bin iff its minimum haversine distance to any of the bin's track
    points is <= buffer_m and its dtg lies in the bin interval. One
    broadcast + one streaming pass, zero shuffle; the per-batch kernel is
    a single (track-points x batch) vectorized distance matrix per bin."""
    from geomesa_ray.geom.kernels import haversine_m
    from geomesa_ray.stages.derive import derive_geometry
    from geomesa_ray.util import resolve_broadcast
    import ray

    if track_lon is None:
        track_lon, track_lat, track_t_s = default_track(fixture_dir)
    lon = np.asarray(track_lon, dtype=np.float64)
    lat = np.asarray(track_lat, dtype=np.float64)
    t = np.asarray(track_t_s, dtype=np.int64)
    order = np.argsort(t, kind="stable")
    lon, lat, t = lon[order], lat[order], t[order]
    n = len(t)
    nbins = min(max_bins, n)
    bin_of = (np.arange(n) * nbins) // n
    bins = []
    for b in range(nbins):
        m = bin_of == b
        bins.append((f"bin{b:03d}", lon[m], lat[m],
                     int(t[m].min()), int(t[m].max())))
    ref = ray.put(bins)

    def probe(batch: pa.Table) -> pa.Table:
        bins_ = resolve_broadcast(ref)
        plon = batch.column("lon").to_numpy(zero_copy_only=False)
        plat = batch.column("lat").to_numpy(zero_copy_only=False)
        dtg = batch.column("dtg_s").to_numpy(zero_copy_only=False)
        ids = batch.column("image_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        out_i, out_b = [], []
        for bin_id, bl, bla, t0, t1 in bins_:
            d = haversine_m(plon[None, :], plat[None, :],
                            bl[:, None], bla[:, None]).min(axis=0)
            m = (d <= buffer_m) & (dtg >= t0) & (dtg <= t1)
            sel = np.nonzero(m)[0]
            if len(sel):
                out_i.append(sel)
                out_b.extend([bin_id] * len(sel))
        if not out_i:
            return pa.table({"image_id": pa.array([], pa.string()),
                             "bin_id": pa.array([], pa.string())})
        return pa.table({
            "image_id": ids.take(pa.array(np.concatenate(out_i))),
            "bin_id": pa.array(out_b, pa.string()),
        })

    ds = read_images(fixture_dir, columns=["image_id", "phash"])
    ds = ds.map_batches(derive_geometry, batch_format="pyarrow")
    return ds.map_batches(probe, batch_format="pyarrow", batch_size=65536)


def tube_select(fixture_dir: str, track_lon=None, track_lat=None,
                track_t_s=None, buffer_deg: float = 3.0,
                max_bins: int = 8, gap_fill: str = "none") -> ray.data.Dataset:
    """(image_id, bin_id) — images inside the tube's space-time bins."""
    if track_lon is None:
        track_lon, track_lat, track_t_s = default_track(fixture_dir)
    bins = build_tube_bins(track_lon, track_lat, track_t_s, buffer_deg,
                           max_bins, gap_fill)
    ds = read_images(fixture_dir, columns=["image_id", "phash"])
    ds = ds.map_batches(derive_and_encode, batch_format="pyarrow")
    out = pip_join_points(ds, bins, emit_cols=("image_id",))
    return out.map_batches(
        lambda b: b.rename_columns(["image_id", "bin_id"]),
        batch_format="pyarrow")
