"""Deterministic synthetic fixture tables (FIXTURES.md F1-F3).

The engine's mandated input shape (BASELINE.json ``input_hint``) is a table
of image + caption pairs::

    image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
    caption:string, phash:int64

Everything is a pure function of the row index (seedless splitmix64 mixing),
so any process — the Ray pipeline, the DuckDB oracle, a test — regenerates
byte-identical tables. Geometry is DERIVED (never stored): the phash's low
32 bits seed lon, high 32 bits seed lat, and ``phash mod 4 weeks`` seeds the
timestamp, spanning >= 4 Z3 week-epochs so week-boundary planning logic
(reference ``Z3IdxStrategy.scala:134-163``) is exercised.

Fixtures are written once per scale under /tmp/graft_fixtures/<sf>/ with an
atomic rename, so the DuckDB oracle SQL can read the exact same parquet via
``read_parquet('/tmp/graft_fixtures/sf0.01/images.parquet')``.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

U = np.uint64

# 2024-01-01T00:00:00Z; data spans 4 weeks from here (crosses 5 epoch weeks
# since this instant is mid-week: 1704067200 / 604800 = 2817.57).
DTG_BASE_S = 1704067200
DTG_SPAN_S = 4 * 604800

FIXTURE_ROOT = "/tmp/graft_fixtures"

IMG_W = 8
IMG_H = 8
IMG_NBYTES = IMG_W * IMG_H * 3

_WORDS = [
    "amber", "basalt", "cedar", "delta", "ember", "fjord", "garnet", "harbor",
    "indigo", "juniper", "krill", "lagoon", "mesa", "nadir", "onyx", "prairie",
]


def splitmix64(x) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain algorithm)."""
    with np.errstate(over="ignore"):
        z = np.asarray(x, dtype=U) + U(0x9E3779B97F4A7C15)
        z = (z ^ (z >> U(30))) * U(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> U(27))) * U(0x94D049BB133111EB)
        return z ^ (z >> U(31))


def rows_for_sf(sf_dir: str) -> int:
    """Image-fixture row count scaled like the driver's lineitem table."""
    name = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(name.replace("sf", ""))
    except ValueError:
        sf = 0.01
    return max(1000, int(6_000_000 * sf))


def gen_images_table(n: int) -> pa.Table:
    """n-row image+caption table, schema exactly per input_hint.

    Deterministic raw RGB pixels: 24 uint64 words per row -> 192 bytes.
    """
    return gen_images_table_range(0, n)


def _ts(seconds: float) -> int:
    return int(seconds) * 1_000_000  # epoch micros


def gen_regions_table() -> pa.Table:
    """Query-side regions (FIXTURES.md F2): boxes, convex polygons, one
    IDL-crossing polygon, one whole-world box, one degenerate tiny box.

    Box rows (kind='box') are SQL-expressible for the DuckDB oracle;
    polygon rows carry single-ring WKT.
    """
    rows = []
    rng = splitmix64(np.arange(4096, dtype=np.int64).view(U)).view(np.int64)

    def frac(k):  # deterministic uniform [0,1)
        return float(rng[k] & np.int64((1 << 52) - 1)) / float(1 << 52)

    k = 0
    t0 = DTG_BASE_S
    spans = [
        (t0, t0 + DTG_SPAN_S),                       # full range
        (t0 + 86400, t0 + 86400 + 3 * 86400),        # inside first week
        (t0 + 5 * 86400, t0 + 12 * 86400),           # crosses a week edge
        (t0 + 13 * 86400, t0 + 27 * 86400),          # crosses several weeks
    ]
    for j in range(12):
        cx = frac(k) * 340.0 - 170.0
        cy = frac(k + 1) * 160.0 - 80.0
        half_w = 0.25 + frac(k + 2) * 2.5
        half_h = 0.25 + frac(k + 3) * 2.5
        ts, te = spans[j % len(spans)]
        rows.append(
            dict(region_id=f"r{j:04d}", kind="box",
                 lon_min=cx - half_w, lon_max=cx + half_w,
                 lat_min=cy - half_h, lat_max=cy + half_h,
                 wkt="", t_start=_ts(ts), t_end=_ts(te))
        )
        k += 4

    for j in range(12, 18):
        cx = frac(k) * 320.0 - 160.0
        cy = frac(k + 1) * 140.0 - 70.0
        r = 0.5 + frac(k + 2) * 2.0
        nv = 8 + (j % 3) * 4
        ang = np.linspace(0.0, 2 * np.pi, nv, endpoint=False) + frac(k + 3)
        xs = cx + r * np.cos(ang) * (1.0 + 0.3 * np.cos(3 * ang))
        ys = cy + r * 0.7 * np.sin(ang)
        ts, te = spans[j % len(spans)]
        wkt = "POLYGON ((" + ", ".join(
            f"{x:.10f} {y:.10f}" for x, y in
            list(zip(xs.tolist(), ys.tolist())) + [(xs[0], ys[0])]) + "))"
        rows.append(
            dict(region_id=f"r{j:04d}", kind="poly",
                 lon_min=float(xs.min()), lon_max=float(xs.max()),
                 lat_min=float(ys.min()), lat_max=float(ys.max()),
                 wkt=wkt, t_start=_ts(ts), t_end=_ts(te))
        )
        k += 4

    # IDL-crossing polygon in unwrapped frame (179 -> 181); reference
    # GeohashUtils.scala:721-773 splits these at the date line.
    rows.append(
        dict(region_id="r_idl", kind="poly",
             lon_min=179.0, lon_max=181.5, lat_min=-12.0, lat_max=-4.0,
             wkt="POLYGON ((179.0 -12.0, 181.5 -12.0, 181.5 -4.0, 179.0 -4.0, 179.0 -12.0))",
             t_start=_ts(spans[0][0]), t_end=_ts(spans[0][1]))
    )
    # whole-world box — the planner must recognize it as unfiltering
    # (QueryFilterSplitter.scala:87-90 whole-world elimination).
    rows.append(
        dict(region_id="r_world", kind="box",
             lon_min=-180.0, lon_max=180.0, lat_min=-90.0, lat_max=90.0,
             wkt="", t_start=_ts(spans[0][0]), t_end=_ts(spans[0][1]))
    )
    # degenerate tiny box (smaller than one finest-level cell)
    rows.append(
        dict(region_id="r_tiny", kind="box",
             lon_min=10.0, lon_max=10.0001, lat_min=10.0, lat_max=10.0001,
             wkt="", t_start=_ts(spans[0][0]), t_end=_ts(spans[0][1]))
    )

    return pa.table(
        {
            "region_id": pa.array([r["region_id"] for r in rows], pa.string()),
            "kind": pa.array([r["kind"] for r in rows], pa.string()),
            "lon_min": pa.array([r["lon_min"] for r in rows], pa.float64()),
            "lon_max": pa.array([r["lon_max"] for r in rows], pa.float64()),
            "lat_min": pa.array([r["lat_min"] for r in rows], pa.float64()),
            "lat_max": pa.array([r["lat_max"] for r in rows], pa.float64()),
            "wkt": pa.array([r["wkt"] for r in rows], pa.string()),
            "t_start": pa.array([r["t_start"] for r in rows], pa.timestamp("us")),
            "t_end": pa.array([r["t_end"] for r in rows], pa.timestamp("us")),
        }
    )


def gen_complex_regions_table() -> pa.Table:
    """Arbitrary-geometry query regions (reference joins against any JTS
    geometry, ``process/query/QueryProcess.scala:24-35``): a polygon with
    an interior ring (hole), a three-part MULTIPOLYGON, a multipolygon
    whose first part carries a hole, and a buffered LINESTRING corridor.
    Built on demand (not written to regions.parquet — that fixture feeds
    SQL-literal oracles and stays stable)."""
    t0, t1 = _ts(DTG_BASE_S), _ts(DTG_BASE_S + DTG_SPAN_S)
    rows = [
        dict(region_id="cx_holes", kind="poly",
             wkt=("POLYGON ((-30 -20, 10 -20, 10 20, -30 20, -30 -20), "
                  "(-20 -10, 0 -10, 0 10, -20 10, -20 -10))"),
             buf_deg=0.0),
        dict(region_id="cx_multi", kind="multipoly",
             wkt=("MULTIPOLYGON (((40 0, 55 0, 55 12, 40 12, 40 0)), "
                  "((60 -30, 75 -30, 75 -18, 60 -18, 60 -30)), "
                  "((80 30, 95 30, 95 45, 80 45, 80 30)))"),
             buf_deg=0.0),
        dict(region_id="cx_multi_hole", kind="multipoly",
             wkt=("MULTIPOLYGON (((100 -60, 140 -60, 140 -30, 100 -30, "
                  "100 -60), (110 -50, 130 -50, 130 -40, 110 -40, "
                  "110 -50)), ((-120 40, -100 40, -100 55, -120 55, "
                  "-120 40)))"),
             buf_deg=0.0),
        dict(region_id="cx_corridor", kind="line",
             wkt="LINESTRING (-150 -40, -130 -20, -110 -25, -90 -5)",
             buf_deg=2.5),
    ]
    n = len(rows)
    return pa.table({
        "region_id": pa.array([r["region_id"] for r in rows], pa.string()),
        "kind": pa.array([r["kind"] for r in rows], pa.string()),
        "lon_min": pa.array([0.0] * n, pa.float64()),
        "lon_max": pa.array([0.0] * n, pa.float64()),
        "lat_min": pa.array([0.0] * n, pa.float64()),
        "lat_max": pa.array([0.0] * n, pa.float64()),
        "wkt": pa.array([r["wkt"] for r in rows], pa.string()),
        "t_start": pa.array([t0] * n, pa.timestamp("us")),
        "t_end": pa.array([t1] * n, pa.timestamp("us")),
        "buf_deg": pa.array([r["buf_deg"] for r in rows], pa.float64()),
    })


def gen_probes_table(n: int = 64) -> pa.Table:
    """kNN probe points (FIXTURES.md F3): cluster-interior, empty-region,
    and near-IDL probes; k in {1, 5, 10}."""
    i = np.arange(n, dtype=np.int64)
    h = splitmix64(i.view(U)).view(np.int64)
    lon = (h & np.int64(0xFFFFFFFF)).astype(np.float64) / float(1 << 32) * 360.0 - 180.0
    lat = ((h >> np.int64(32)) & np.int64(0xFFFFFFFF)).astype(np.float64) / float(1 << 32) * 180.0 - 90.0
    # a few probes pinned near the IDL and the poles
    lon[: 4] = [179.9, -179.9, 0.0, 0.0]
    lat[: 4] = [0.0, 0.0, 89.5, -89.5]
    k = np.array([1, 5, 10], dtype=np.int32)[(i % 3).astype(np.int64)]
    return pa.table(
        {
            "probe_id": pa.array([f"p{j:04d}" for j in range(n)], pa.string()),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
            "k": pa.array(k),
            "max_dist_m": pa.array(np.full(n, 5_000_000.0)),
        }
    )


def fixture_dir_for(sf_dir: str) -> str:
    return os.path.join(FIXTURE_ROOT, os.path.basename(os.path.normpath(sf_dir)))


def ensure_scaling_corpus(n_files: int = 32, rows_per_file: int = 600_000) -> str:
    """Multi-file image corpus for the scaling benchmark: ``n_files``
    parquet shards with disjoint deterministic row ranges (row index
    offset per shard). A single-file corpus read concurrently does NOT
    scale — all read tasks contend on one inode/page-cache — which is a
    benchmark artifact, not an engine property; real corpora are
    many-file. Generated once under /tmp/graft_fixtures/scaling/."""
    out_dir = os.path.join(FIXTURE_ROOT, f"scaling_{n_files}x{rows_per_file}")
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    import shutil

    os.makedirs(FIXTURE_ROOT, exist_ok=True)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir, ignore_errors=True)
    tmp = tempfile.mkdtemp(prefix=".scaling_", dir=FIXTURE_ROOT)
    for f in range(n_files):
        t = gen_images_table_range(f * rows_per_file, rows_per_file)
        pq.write_table(t, os.path.join(tmp, f"images_{f:04d}.parquet"),
                       row_group_size=131072)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as fh:
        fh.write("ok")
    try:
        os.rename(tmp, out_dir)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out_dir


def gen_images_table_range(start: int, n: int) -> pa.Table:
    """Images table for row indexes [start, start+n) — same derivation as
    gen_images_table but offset, so shards are disjoint."""
    i = np.arange(start, start + n, dtype=np.int64)
    phash = splitmix64(i.view(U)).view(np.int64)
    image_id = np.char.add("img", np.char.zfill(i.astype("U8"), 8))
    word = [_WORDS[int(h)] for h in (phash & np.int64(15))]
    caption = [f"caption for img{k:08d} #{w}" for k, w in zip(i.tolist(), word)]
    words = splitmix64((i[:, None] * np.int64(24)
                        + np.arange(24, dtype=np.int64)[None, :]).view(U))
    pixels = words.astype("<u8").view(np.uint8).reshape(n * IMG_NBYTES)
    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * IMG_NBYTES)
    bytes_arr = pa.BinaryArray.from_buffers(
        pa.binary(), n, [None, offsets.buffers()[1], pa.py_buffer(pixels.tobytes())])
    return pa.table({
        "image_id": pa.array(image_id.tolist(), type=pa.string()),
        "bytes": bytes_arr,
        "w": pa.array(np.full(n, IMG_W, dtype=np.int32)),
        "h": pa.array(np.full(n, IMG_H, dtype=np.int32)),
        "fmt": pa.array(["raw"] * n, type=pa.string()),
        "caption": pa.array(caption, type=pa.string()),
        "phash": pa.array(phash),
    })


_SHARD_THRESHOLD = 100_000  # single file below this (oracle scales)
_SHARD_ROWS = 37_500


def _image_shards(n: int) -> int:
    """Shard count for the images table: 0 = single file. Corpora past
    the oracle scales are written as many files because a single-file
    parquet read runs as ONE Ray task (SplitBlocks only re-chunks the
    output), serializing the scan ahead of every image pipeline — and
    real 100 TB corpora are many-file anyway."""
    if n <= _SHARD_THRESHOLD:
        return 0
    return min(64, -(-n // _SHARD_ROWS))


def ensure_fixtures(sf_dir: str, n_rows: int | None = None) -> str:
    """Generate (once, atomically) the fixture parquet for this scale.

    Returns the fixture directory containing the images table
    (images.parquet, or images_NNNN.parquet shards at bench scales),
    regions.parquet, probes.parquet.
    """
    import shutil

    out_dir = fixture_dir_for(sf_dir)
    done = os.path.join(out_dir, "_SUCCESS")
    n = n_rows if n_rows is not None else rows_for_sf(sf_dir)
    shards = _image_shards(n)
    if os.path.exists(done):
        # regenerate a cached dir whose layout predates sharding
        single = os.path.exists(os.path.join(out_dir, "images.parquet"))
        if (shards == 0) == single:
            return out_dir
        shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(FIXTURE_ROOT, exist_ok=True)
    if os.path.exists(out_dir):  # partial leftover from a crashed run
        shutil.rmtree(out_dir, ignore_errors=True)
    tmp = tempfile.mkdtemp(prefix=".fixtures_", dir=FIXTURE_ROOT)
    if shards == 0:
        pq.write_table(gen_images_table(n),
                       os.path.join(tmp, "images.parquet"),
                       row_group_size=65536)
    else:
        per = -(-n // shards)
        for f in range(shards):
            start = f * per
            cnt = min(per, n - start)
            pq.write_table(gen_images_table_range(start, cnt),
                           os.path.join(tmp, f"images_{f:04d}.parquet"),
                           row_group_size=65536)
    pq.write_table(gen_regions_table(), os.path.join(tmp, "regions.parquet"))
    pq.write_table(gen_probes_table(), os.path.join(tmp, "probes.parquet"))
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    try:
        os.rename(tmp, out_dir)
    except OSError:
        # lost a creation race — the winner's copy is identical (deterministic)
        shutil.rmtree(tmp, ignore_errors=True)
    return out_dir


def ensure_mixed_jpeg_corpus(sf_dir: str, n: int | None = None,
                             denom: int = 20) -> str:
    """A compressed-corpus fixture exercising ALL three JPEG stream
    kinds the codec supports on the corpus path: three contiguous
    sections (the realistic shape — real corpora cluster by source) of

    * baseline SOF0                (lockstep batch decode),
    * baseline + DRI/RSTm          (per-image restart-aware decode),
    * progressive SOF2             (multi-scan per-image decode),

    each re-encoding the SAME deterministic raw pixels as the main
    fixture rows [0, n). Cached once under
    ``/tmp/graft_fixtures/<base>_mixedjpeg``; ``n`` defaults to the
    scale's row count / ``denom``. Returns the corpus directory
    (read_images-compatible: images.parquet)."""
    import shutil

    from geomesa_ray.codecs.jpeg import (encode_jpeg_batch,
                                         encode_jpeg_progressive_batch)

    if n is None:
        n = max(300, rows_for_sf(sf_dir) // denom)
    n -= n % 3
    base = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(FIXTURE_ROOT, f"{base}_mixedjpeg")
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        with open(done) as f:
            if f.read() == f"n={n},v2":
                return out_dir
        shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(FIXTURE_ROOT, exist_ok=True)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir, ignore_errors=True)
    t = gen_images_table_range(0, n)
    pixels = np.frombuffer(b"".join(t.column("bytes").to_pylist()),
                           dtype=np.uint8).reshape(n, IMG_H, IMG_W, 3)
    third = n // 3
    bufs = list(encode_jpeg_batch(pixels[:third]))
    bufs += list(encode_jpeg_batch(pixels[third:2 * third],
                                   restart_interval=2))
    bufs += list(encode_jpeg_progressive_batch(pixels[2 * third:]))
    out = t.set_column(t.schema.get_field_index("bytes"), "bytes",
                       pa.array(bufs, pa.binary()))
    out = out.set_column(t.schema.get_field_index("fmt"), "fmt",
                         pa.array(["jpeg"] * n, pa.string()))
    tmp = tempfile.mkdtemp(prefix=".mixedjpeg_", dir=FIXTURE_ROOT)
    # many-file layout: a single parquet file reads as ONE Ray task
    # (SplitBlocks only re-chunks), serializing the scan ahead of the
    # transcode — the same trap the main fixture hit in round 3
    shard_rows = 4096
    nsh = -(-n // shard_rows)
    if nsh <= 1:
        pq.write_table(out, os.path.join(tmp, "images.parquet"),
                       row_group_size=65536)
    else:
        for f_i in range(nsh):
            pq.write_table(out.slice(f_i * shard_rows, shard_rows),
                           os.path.join(tmp, f"images_{f_i:04d}.parquet"),
                           row_group_size=65536)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write(f"n={n},v2")
    try:
        os.rename(tmp, out_dir)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out_dir
