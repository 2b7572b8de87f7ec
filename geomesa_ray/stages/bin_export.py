"""BIN compact export: the reference's 16/24-byte packed point format.

Byte-exact parity with ``geomesa-filter/.../Convert2ViewerFunction.scala:78-99``:
little-endian records of (trackId:int32, time-seconds:int32, lat:float32,
lon:float32) and the 24-byte labeled variant appending label:int64.
Packing is one NumPy structured-array write per batch; the optional
sort-by-time inside each chunk mirrors ``BinAggregatingIterator.scala:52,84``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from geomesa_ray.sources.io import read_images
from geomesa_ray.stages.derive import derive_geometry

BIN_DTYPE = np.dtype([("track", "<i4"), ("secs", "<i4"),
                      ("lat", "<f4"), ("lon", "<f4")])
BIN_DTYPE_LABELED = np.dtype([("track", "<i4"), ("secs", "<i4"),
                              ("lat", "<f4"), ("lon", "<f4"),
                              ("label", "<i8")])


def pack_bin(track: np.ndarray, secs: np.ndarray, lat: np.ndarray,
             lon: np.ndarray, label: np.ndarray | None = None,
             sort_by_time: bool = True) -> bytes:
    """Pack arrays into the BIN byte layout (one contiguous chunk)."""
    if sort_by_time:
        order = np.argsort(secs, kind="stable")
        track, secs, lat, lon = track[order], secs[order], lat[order], lon[order]
        if label is not None:
            label = label[order]
    out = np.empty(len(track), dtype=BIN_DTYPE_LABELED if label is not None
                   else BIN_DTYPE)
    out["track"] = track.astype(np.int32)
    out["secs"] = secs.astype(np.int32)
    out["lat"] = lat.astype(np.float32)
    out["lon"] = lon.astype(np.float32)
    if label is not None:
        out["label"] = label.astype(np.int64)
    return out.tobytes()


def unpack_bin(buf: bytes, labeled: bool = False) -> np.ndarray:
    return np.frombuffer(buf, dtype=BIN_DTYPE_LABELED if labeled else BIN_DTYPE)


def bin_export(fixture_dir: str, labeled: bool = False,
               sort_by_time: bool = True) -> ray.data.Dataset:
    """One row per batch: (n_records, bin_bytes). track id = low 31 bits
    of phash; secs relative to the unix epoch (fits int32 through 2038 —
    same layout limit as the reference)."""

    def pack(batch: pa.Table) -> pa.Table:
        b = derive_geometry(batch)
        ph = b.column("phash").to_numpy(zero_copy_only=False)
        track = (ph & np.int64(0x7FFFFFFF)).astype(np.int32)
        secs = b.column("dtg_s").to_numpy(zero_copy_only=False).astype(np.int64)
        lat = b.column("lat").to_numpy(zero_copy_only=False)
        lon = b.column("lon").to_numpy(zero_copy_only=False)
        label = ph if labeled else None
        buf = pack_bin(track, secs, lat, lon, label, sort_by_time)
        return pa.table({
            "n_records": pa.array([batch.num_rows], pa.int64()),
            "bin_bytes": pa.array([buf], pa.binary()),
        })

    ds = read_images(fixture_dir, columns=["phash"])
    return ds.map_batches(pack, batch_format="pyarrow")


def bin_records(fixture_dir: str) -> ray.data.Dataset:
    """One row per BIN record, ROUND-TRIPPED through the packed bytes
    (pack -> unpack), so the byte layout is exercised while the output is
    SQL-comparable: (track, secs, lat32, lon32) with the format's float32
    coordinate rounding (DuckDB mirror: CAST(x AS REAL))."""

    def pack_unpack(batch: pa.Table) -> pa.Table:
        b = derive_geometry(batch)
        ph = b.column("phash").to_numpy(zero_copy_only=False)
        track = (ph & np.int64(0x7FFFFFFF)).astype(np.int32)
        secs = b.column("dtg_s").to_numpy(zero_copy_only=False)
        lat = b.column("lat").to_numpy(zero_copy_only=False)
        lon = b.column("lon").to_numpy(zero_copy_only=False)
        rec = unpack_bin(pack_bin(track, secs, lat, lon))
        return pa.table({
            "track": pa.array(rec["track"].astype(np.int64)),
            "secs": pa.array(rec["secs"].astype(np.int64)),
            "lat32": pa.array(rec["lat"].astype(np.float64)),
            "lon32": pa.array(rec["lon"].astype(np.float64)),
        })

    ds = read_images(fixture_dir, columns=["phash"])
    return ds.map_batches(pack_unpack, batch_format="pyarrow")
