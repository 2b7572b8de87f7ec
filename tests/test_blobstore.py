"""Blob store (reference: geomesa-blobstore AccumuloBlobStore.scala:34-99
— id-keyed payload table + skinny spatial feature index; WKTFileHandler
param-derived geometry) — put/get/get_ids/fetch/delete + resume."""

import os

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.state.blobstore import (
    blob_meta,
    delete_blobs,
    fetch_blobs,
    get_blob,
    get_ids,
    put_blobs,
    rows_from_params,
)

N = 500


def _corpus() -> pa.Table:
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 180, N)
    lat = rng.uniform(-90, 90, N)
    return pa.table({
        "blob_id": pa.array([f"blob{i:05d}" for i in range(N)]),
        "filename": pa.array([f"f{i}.bin" for i in range(N)]),
        "bytes": pa.array([bytes([i % 256]) * (10 + i % 90)
                           for i in range(N)], pa.binary()),
        "lon": pa.array(lon), "lat": pa.array(lat),
        "dtg_s": pa.array((1700000000 + np.arange(N) * 3600)
                          .astype(np.int64)),
    })


@pytest.fixture(scope="module")
def bstore(ray_session, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("blobstore") / "bs")
    stats = put_blobs(root, _corpus())
    return root, stats


class TestPutGet:
    def test_put_stats_and_layouts(self, bstore):
        root, stats = bstore
        assert stats["blobs"]["rows"] == N == stats["index"]["rows"]
        assert stats["blobs"]["partitions"] > 1
        assert os.path.exists(os.path.join(root, "meta.json"))

    def test_point_get_byte_exact(self, bstore):
        root, _ = bstore
        t = _corpus()
        for i in (0, 7, N - 1):
            data, name = get_blob(root, t.column("blob_id")[i].as_py())
            assert data == t.column("bytes")[i].as_py()
            assert name == t.column("filename")[i].as_py()

    def test_get_missing_is_empty(self, bstore):
        root, _ = bstore
        assert get_blob(root, "nope") == (b"", "")

    def test_fetch_many_distributed(self, bstore):
        root, _ = bstore
        t = _corpus()
        ids = [t.column("blob_id")[i].as_py() for i in range(0, N, 17)]
        rows = {r["blob_id"]: r["bytes"]
                for r in fetch_blobs(root, ids).take_all()}
        want = {t.column("blob_id")[i].as_py(): t.column("bytes")[i].as_py()
                for i in range(0, N, 17)}
        assert rows == want


class TestSpatialIds:
    def test_get_ids_matches_brute_force(self, bstore):
        root, _ = bstore
        t = _corpus()
        bbox = (-60.0, 40.0, -30.0, 45.0)
        got = {r["blob_id"] for r in get_ids(root, bbox=bbox).take_all()}
        lon = t.column("lon").to_numpy()
        lat = t.column("lat").to_numpy()
        m = (lon >= bbox[0]) & (lon <= bbox[1]) \
            & (lat >= bbox[2]) & (lat <= bbox[3])
        want = set(np.array(t.column("blob_id").to_pylist())[m].tolist())
        assert got == want and got

    def test_interval_composes(self, bstore):
        root, _ = bstore
        t = _corpus()
        iv = (1700000000 + 100 * 3600, 1700000000 + 300 * 3600)
        got = {r["blob_id"]
               for r in get_ids(root, interval_s=iv).take_all()}
        d = t.column("dtg_s").to_numpy()
        m = (d >= iv[0]) & (d <= iv[1])
        want = set(np.array(t.column("blob_id").to_pylist())[m].tolist())
        assert got == want and got

    def test_bbox_prunes_partitions(self, bstore):
        from geomesa_ray.state.blobstore import index_parts_for_bbox

        root, _ = bstore
        small = index_parts_for_bbox(root, (1.0, 2.0, 1.0, 2.0))
        full = index_parts_for_bbox(root, None)
        assert small and len(small) < len(full)
        # schema stays clean: no hive part= key leaks into results
        assert "part" not in get_ids(root).schema().names


class TestDeleteResume:
    def test_delete_removes_everywhere(self, ray_session, tmp_path):
        root = str(tmp_path / "bs")
        put_blobs(root, _corpus())
        victims = ["blob00003", "blob00400"]
        out = delete_blobs(root, victims)
        assert out["deleted"] == 2
        assert get_blob(root, victims[0]) == (b"", "")
        left = {r["blob_id"] for r in get_ids(root).take_all()}
        assert not set(victims) & left and len(left) == N - 2

    def test_put_replay_is_byte_idempotent(self, ray_session, tmp_path):
        import hashlib

        def layout_sha(root):
            h = hashlib.sha256()
            for layout in ("blobs", "index"):
                base = os.path.join(root, layout)
                for p in sorted(os.listdir(base)):
                    f = os.path.join(base, p, "data.parquet")
                    if p.startswith("part=") and os.path.exists(f):
                        with open(f, "rb") as fh:
                            h.update(fh.read())
            return h.hexdigest()

        root = str(tmp_path / "bs2")
        put_blobs(root, _corpus())
        before = layout_sha(root)
        put_blobs(root, _corpus())  # replay: id-upsert merge, no dups
        assert layout_sha(root) == before
        assert get_ids(root).count() == N

    def test_second_put_merges_into_committed_partitions(
            self, ray_session, tmp_path):
        """Review regression: a later put whose rows hash into
        partitions committed by an EARLIER put must ADD them (the old
        resume filter silently dropped them)."""
        root = str(tmp_path / "bs2b")
        put_blobs(root, _corpus())  # fills every partition
        extra = pa.table({
            "blob_id": pa.array(["zextra00001", "zextra00002"]),
            "filename": pa.array(["x1.bin", "x2.bin"]),
            "bytes": pa.array([b"\xaa" * 5, b"\xbb" * 9], pa.binary()),
            "lon": pa.array([12.0, -140.0]),
            "lat": pa.array([47.0, -20.0]),
            "dtg_s": pa.array([1, 2], pa.int64()),
        })
        put_blobs(root, extra)
        assert get_ids(root).count() == N + 2
        assert get_blob(root, "zextra00001") == (b"\xaa" * 5, "x1.bin")
        # and an id REPLAY upserts rather than duplicating
        put_blobs(root, extra)
        assert get_ids(root).count() == N + 2

    def test_scheme_guard(self, ray_session, tmp_path):
        root = str(tmp_path / "bs3")
        put_blobs(root, _corpus())
        with pytest.raises(ValueError, match="scheme"):
            put_blobs(root, _corpus(), n_blob_parts=8)


class TestHandler:
    def test_rows_from_params_wkt(self, ray_session, tmp_path):
        files = [("a.jpg", b"\x01\x02"), ("b.jpg", b"\x03\x04\x05")]
        params = [{"wkt": "POINT (10.5 -3.25)", "dtg_s": 1700000000},
                  {"wkt": "POINT (-120 45)", "dtg_s": 1700003600}]
        t = rows_from_params(files, params)
        assert t.column("lon").to_pylist() == [10.5, -120.0]
        assert t.column("lat").to_pylist() == [-3.25, 45.0]
        assert t.column("bytes")[1].as_py() == b"\x03\x04\x05"
        # ids deterministic and distinct
        ids = t.column("blob_id").to_pylist()
        assert len(set(ids)) == 2 and ids[0].startswith("a_")
        root = str(tmp_path / "bs4")
        put_blobs(root, t)
        data, name = get_blob(root, ids[0])
        assert data == b"\x01\x02" and name == "a.jpg"
        with pytest.raises(ValueError, match="points only"):
            rows_from_params([("c.jpg", b"")],
                             [{"wkt": "LINESTRING (0 0, 1 1)",
                               "dtg_s": 0}])


class TestExifHandler:
    """EXIF GPS handler (MetadataFileHandler.scala:24-45 analog):
    geometry + DateTimeOriginal parsed straight from the JPEG's APP1
    TIFF structure, both byte orders; files without GPS are skipped
    (canProcess=False)."""

    def _jpeg_with_gps(self, lat, lon, dtg_s=None, big_endian=False):
        from geomesa_ray.codecs.exif import insert_exif
        from geomesa_ray.codecs.jpeg import encode_jpeg

        img = np.full((8, 8, 3), 127, dtype=np.uint8)
        return insert_exif(encode_jpeg(img), lat, lon, dtg_s,
                           big_endian=big_endian)

    @pytest.mark.parametrize("lat,lon", [
        (57.64911, 10.40744), (-33.8568, 151.2153),
        (0.0, 0.0), (89.999999, -179.999999), (-0.5, 0.5)])
    @pytest.mark.parametrize("big_endian", [False, True])
    def test_gps_roundtrip_both_byte_orders(self, lat, lon, big_endian):
        from geomesa_ray.codecs.exif import read_exif_gps

        buf = self._jpeg_with_gps(lat, lon, 1700000000,
                                  big_endian=big_endian)
        gps = read_exif_gps(buf)
        assert gps is not None
        # DMS rationals at 1e-6 arcsecond resolution: ~3e-10 degrees
        assert abs(gps["lat"] - lat) < 1e-9
        assert abs(gps["lon"] - lon) < 1e-9
        assert gps["dtg_s"] == 1700000000

    def test_exif_jpeg_still_decodes(self):
        from geomesa_ray.codecs.jpeg import decode_jpeg, encode_jpeg

        img = np.full((8, 8, 3), 127, dtype=np.uint8)
        plain = decode_jpeg(encode_jpeg(img))
        got = decode_jpeg(self._jpeg_with_gps(42.0, -5.6))
        assert np.array_equal(got, plain)  # APP1 is metadata-transparent

    def test_no_gps_returns_none(self):
        from geomesa_ray.codecs.exif import read_exif_gps
        from geomesa_ray.codecs.jpeg import encode_jpeg

        img = np.full((8, 8, 3), 9, dtype=np.uint8)
        assert read_exif_gps(encode_jpeg(img)) is None
        assert read_exif_gps(b"\x00not a jpeg") is None

    def test_handler_feeds_blobstore(self, ray_session, tmp_path):
        from geomesa_ray.state.blobstore import rows_from_exif

        with_gps = self._jpeg_with_gps(42.605, -5.603, 1700000000)
        from geomesa_ray.codecs.jpeg import encode_jpeg

        no_gps = encode_jpeg(np.full((8, 8, 3), 3, dtype=np.uint8))
        t = rows_from_exif([("a.jpg", with_gps), ("plain.jpg", no_gps)])
        assert t.num_rows == 1  # the GPS-less file is skipped
        assert abs(t.column("lon")[0].as_py() - -5.603) < 1e-9
        assert abs(t.column("lat")[0].as_py() - 42.605) < 1e-9
        assert t.column("dtg_s")[0].as_py() == 1700000000

        root = str(tmp_path / "bs")
        put_blobs(root, t)
        got = get_ids(root, bbox=(-6.0, -5.0, 42.0, 43.0)).take_all()
        assert [r["filename"] for r in got] == ["a.jpg"]
        data, name = get_blob(root, t.column("blob_id")[0].as_py())
        assert data == with_gps and name == "a.jpg"

    def test_corrupt_exif_is_skipped_not_fatal(self):
        """A truncated APP1 maps to canProcess=False (skip), never a
        struct.error out of the whole ingest batch."""
        from geomesa_ray.codecs.exif import insert_exif, read_exif_gps
        from geomesa_ray.codecs.jpeg import encode_jpeg
        from geomesa_ray.state.blobstore import rows_from_exif

        img = np.full((8, 8, 3), 50, dtype=np.uint8)
        good = insert_exif(encode_jpeg(img), 10.0, 20.0, 1700000000)
        # truncate mid-GPS-IFD: keep the APP1 marker + half its body
        app1_at = good.find(b"\xff\xe1")
        bad = good[:app1_at + 24] + good[app1_at + 200:]
        assert read_exif_gps(bad) is None
        t = rows_from_exif([("bad.jpg", bad), ("good.jpg", good)])
        assert t.num_rows == 1 and t.column("filename")[0].as_py() \
            == "good.jpg"

    def test_same_name_same_length_ids_distinct(self):
        """Review regression: the blob id hashes FULL content — two
        same-name same-length files with different bytes collide no
        more."""
        a = rows_from_params([("photo.jpg", b"\x01" * 100)],
                             [{"wkt": "POINT (0 0)", "dtg_s": 0}])
        b = rows_from_params([("photo.jpg", b"\x02" * 100)],
                             [{"wkt": "POINT (0 0)", "dtg_s": 0}])
        assert a.column("blob_id")[0].as_py() \
            != b.column("blob_id")[0].as_py()


class TestDatasetPut:
    """Round-5: bulk puts accept a ray.data.Dataset (payload bytes
    stream; the driver never holds them) and must produce partition
    bytes IDENTICAL to the driver-table path — the merge-commit
    invariant across input shapes."""

    @staticmethod
    def _layout_hashes(root):
        import hashlib

        out = {}
        for layout in ("blobs", "index"):
            base = os.path.join(root, layout)
            for p in sorted(os.listdir(base)):
                f = os.path.join(base, p, "data.parquet")
                if p.startswith("part=") and os.path.exists(f):
                    with open(f, "rb") as fh:
                        out[f"{layout}/{p}"] = \
                            hashlib.sha256(fh.read()).hexdigest()
        return out

    def test_dataset_put_layout_byte_identical(self, ray_session,
                                               tmp_path):
        import ray.data

        t = _corpus()
        r_table = str(tmp_path / "bs_table")
        r_ds = str(tmp_path / "bs_ds")
        put_blobs(r_table, t)
        # a deliberately different block shape: byte-identity must not
        # depend on input partitioning
        put_blobs(r_ds, ray.data.from_arrow(t).repartition(13))
        ht, hd = self._layout_hashes(r_table), self._layout_hashes(r_ds)
        assert ht and ht == hd

    def test_dataset_put_missing_column_raises(self, ray_session,
                                               tmp_path):
        import ray.data

        bad = _corpus().drop_columns(["dtg_s"])
        with pytest.raises(ValueError, match="dtg_s"):
            put_blobs(str(tmp_path / "bs"), ray.data.from_arrow(bad))


class TestDeletePruning:
    """Round-5: delete resolves each id's Z2 bucket from the payload
    side (skinny column read) and rewrites ONLY the touched index
    partitions — untouched partitions keep their mtime and bytes."""

    def test_delete_only_touches_hit_partitions(self, ray_session,
                                                tmp_path):
        import hashlib

        from geomesa_ray.curve.sfc import Z2Grid
        from geomesa_ray.state.blobstore import _id_hashes

        root = str(tmp_path / "bs")
        t = _corpus()
        put_blobs(root, t)
        meta = blob_meta(root)
        victims = [t.column("blob_id")[i].as_py() for i in (3, 77, 310)]
        vmask = np.isin(np.asarray(t.column("blob_id").to_pylist()),
                        victims)
        grid = Z2Grid(meta["cell_level"])
        cells = grid.encode(t.column("lon").to_numpy()[vmask],
                            t.column("lat").to_numpy()[vmask])
        shift = 2 * (meta["cell_level"] - meta["bucket_level"])
        exp_iparts = {int(c) for c in cells >> np.int64(shift)}
        h = _id_hashes(pa.array(victims, pa.string()))
        exp_bparts = set((h.view(np.uint64)
                          % np.uint64(meta["n_blob_parts"]))
                         .astype(np.int64).tolist())

        def snap():
            out = {}
            for layout in ("blobs", "index"):
                base = os.path.join(root, layout)
                for p in sorted(os.listdir(base)):
                    f = os.path.join(base, p, "data.parquet")
                    if p.startswith("part=") and os.path.exists(f):
                        with open(f, "rb") as fh:
                            digest = hashlib.sha256(fh.read()).hexdigest()
                        out[(layout, int(p[5:]))] = \
                            (os.stat(f).st_mtime_ns, digest)
            return out

        before = snap()
        assert delete_blobs(root, victims)["deleted"] == len(victims)
        after = snap()
        changed = {k for k in before if before[k] != after[k]}
        # every rewritten partition is one the victims actually touch...
        for layout, part in changed:
            assert part in (exp_bparts if layout == "blobs"
                            else exp_iparts), (layout, part)
        # ...and every untouched partition kept mtime AND bytes
        for k in set(before) - changed:
            assert before[k] == after[k]
        # the ids are really gone, everything else intact
        assert get_blob(root, victims[0]) == (b"", "")
        left = {r["blob_id"] for r in get_ids(root).take_all()}
        assert left == set(t.column("blob_id").to_pylist()) - set(victims)


class TestHandlerRegistry:
    """Round-5: named put-param handler registry — the
    BlobStoreFileHandler SPI analog."""

    def test_builtin_handlers_resolve(self):
        from geomesa_ray.state.blobstore import resolve_blob_handler

        assert resolve_blob_handler("wkt") is rows_from_params
        t = resolve_blob_handler("wkt")(
            [("a.bin", b"xy")], [{"wkt": "POINT (1 2)", "dtg_s": 7}])
        assert t.column("lon")[0].as_py() == 1.0
        with pytest.raises(KeyError, match="unknown blob handler"):
            resolve_blob_handler("nope")

    def test_register_and_collision(self):
        from geomesa_ray.state.blobstore import (BLOB_HANDLERS,
                                                 register_blob_handler,
                                                 resolve_blob_handler)

        def custom(files, params):
            return rows_from_params(files, params)

        register_blob_handler("custom_test", custom)
        try:
            assert resolve_blob_handler("custom_test") is custom
            with pytest.raises(ValueError, match="already registered"):
                register_blob_handler("wkt", custom)
        finally:
            del BLOB_HANDLERS["custom_test"]

    def test_exif_via_registry(self):
        from geomesa_ray.codecs.exif import insert_exif
        from geomesa_ray.codecs.jpeg import encode_jpeg
        from geomesa_ray.state.blobstore import resolve_blob_handler

        img = np.full((8, 8, 3), 60, dtype=np.uint8)
        buf = insert_exif(encode_jpeg(img), 12.5, -7.25, 1700000000)
        t = resolve_blob_handler("exif")([("p.jpg", buf)],
                                         [{"dtg_s": 5}])
        assert t.num_rows == 1
        assert abs(t.column("lat")[0].as_py() - 12.5) < 1e-9
        assert t.column("dtg_s")[0].as_py() == 1700000000
