"""CLI tools — the geomesa-tools analog surface.

Reference parity: ``geomesa-tools/.../Runner.scala`` command registry
(Ingest/Export/Describe/List/Explain/QueryStats/RemoveSchema/Version
commands). Each test drives ``geomesa_ray.cli.main`` in-process against
the session Ray instance (the CLI's init guard must not re-init or shut
it down).
"""

import json
import os

import pytest

from geomesa_ray.cli import main


@pytest.fixture(scope="module")
def cli_store(ray_session, tiny_fixtures, tmp_path_factory, capsys=None):
    d = str(tmp_path_factory.mktemp("cli") / "store")
    assert main(["ingest", tiny_fixtures, d]) == 0
    assert main(["attr-index", d, "week", "--n-parts", "4"]) == 0
    return d


def _json_out(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


class TestCli:
    def test_version(self, capsys):
        assert main(["version"]) == 0
        from geomesa_ray import __version__

        assert capsys.readouterr().out.strip() == __version__

    def test_ingest_prints_skew_stats(self, ray_session, tiny_fixtures,
                                      tmp_path, capsys):
        d = str(tmp_path / "s")
        assert main(["ingest", tiny_fixtures, d]) == 0
        out = _json_out(capsys)
        assert out["partitions"] > 0 and out["rows"] == 6000

    def test_describe(self, cli_store, capsys):
        assert main(["describe", cli_store]) == 0
        out = _json_out(capsys)
        assert out["rows"] == 6000
        assert out["attr_indexes"] == ["week"]
        assert out["sort_key"] == ["week", "z3", "image_id"]

    def test_list(self, cli_store, capsys):
        root = os.path.dirname(cli_store)
        assert main(["list", root]) == 0
        assert os.path.basename(cli_store) in \
            capsys.readouterr().out.split()

    def test_explain_spatial_prunes(self, cli_store, capsys):
        assert main(["explain", "BBOX(geom, -10, -5, 25, 30)",
                     "--store", cli_store]) == 0
        out = _json_out(capsys)
        assert out["strategy"] == "st"
        assert 0 < out["partitions"]["scanned"] \
            < out["partitions"]["total"]

    def test_explain_attr_index(self, cli_store, capsys):
        assert main(["explain", "week BETWEEN 2800 AND 2801",
                     "--store", cli_store]) == 0
        out = _json_out(capsys)
        assert out["strategy"] == "attribute"
        assert out["attr_index"]["column"] == "week"

    def test_explain_tree_fallback(self, capsys):
        assert main(["explain", "NOT fmt = 'raw'"]) == 0
        assert _json_out(capsys)["strategy"] == "scan"

    def test_export_csv(self, cli_store, tiny_fixtures, tmp_path,
                        capsys):
        out_dir = str(tmp_path / "exp")
        assert main(["export", "BBOX(geom, -10, -5, 25, 30)", out_dir,
                     "--store", cli_store, "--src", tiny_fixtures]) == 0
        res = _json_out(capsys)
        assert res["files"] > 0
        # exported rows match the engine query
        import csv

        n = 0
        for name in os.listdir(out_dir):
            with open(os.path.join(out_dir, name)) as f:
                n += max(0, sum(1 for _ in csv.reader(f)) - 1)
        from geomesa_ray.engine import GeoMesaRayEngine

        eng = GeoMesaRayEngine(tiny_fixtures, store_dir=cli_store)
        assert n == eng.cql("BBOX(geom, -10, -5, 25, 30)").count() > 0

    def test_query_stats(self, cli_store, tiny_fixtures, capsys):
        assert main(["query-stats", "week >= 0", "--store", cli_store,
                     "--src", tiny_fixtures]) == 0
        out = _json_out(capsys)
        assert out["rows"] == 6000 and out["strategy"] == "attribute"

    def test_stats_histogram(self, ray_session, capsys):
        """histogram kind runs the distributed exact top-k (no full
        driver-side histogram): values AND order match DuckDB."""
        assert main(["stats", "/root/testdata/sf0.001", "events",
                     "event_type", "--top", "3"]) == 0
        lines = capsys.readouterr().out.strip().splitlines()
        import duckdb

        want = duckdb.sql(
            "SELECT event_type, count(*) c FROM "
            "read_parquet('/root/testdata/sf0.001/events.parquet') "
            "GROUP BY 1 ORDER BY c DESC, event_type LIMIT 3").fetchall()
        assert lines == [f"{v}\t{c}" for v, c in want]

    def test_stats_minmax(self, ray_session, capsys):
        assert main(["stats", "/root/testdata/sf0.001", "events",
                     "value", "--kind", "minmax"]) == 0
        out = _json_out(capsys)
        assert out["min"] <= out["max"]

    def test_stats_approx_distinct(self, ray_session, capsys):
        assert main(["stats", "/root/testdata/sf0.001", "events",
                     "user_id", "--kind", "approx-distinct"]) == 0
        out = _json_out(capsys)
        assert out["approx_distinct"] > 0

    def test_remove_schema_needs_force(self, ray_session, tiny_fixtures,
                                       tmp_path, capsys):
        d = str(tmp_path / "s")
        main(["ingest", tiny_fixtures, d])
        capsys.readouterr()
        assert main(["remove-schema", d]) == 2  # refused
        assert os.path.exists(d)
        assert main(["remove-schema", d, "--force"]) == 0
        assert not os.path.exists(d)

    def test_remove_schema_rejects_non_store(self, tmp_path, capsys):
        d = str(tmp_path / "not_a_store")
        os.makedirs(d)
        assert main(["remove-schema", d, "--force"]) == 2
        assert os.path.exists(d)


class TestCliArgValidation:
    def test_export_requires_src_or_store(self, ray_session, tmp_path,
                                          capsys):
        with pytest.raises(SystemExit):
            main(["export", "week >= 0", str(tmp_path / "o")])

    def test_geometry_query_requires_src(self, cli_store, tmp_path,
                                         capsys):
        with pytest.raises(SystemExit):
            main(["export",
                  "INTERSECTS(geom, POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)))",
                  str(tmp_path / "o"), "--store", cli_store])


class TestTranscodeCommand:
    def test_transcode_roundtrip(self, ray_session, tiny_fixtures,
                                 tmp_path, capsys):
        """CLI corpus re-encode: payloads come back as the target
        format, captions untouched (the payload contract)."""
        import glob

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        out = str(tmp_path / "tc")
        assert main(["transcode", "--src", tiny_fixtures, "--out", out,
                     "--format", "png", "--no-actors"]) == 0
        info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert info["format"] == "png" and info["files"] >= 1
        t = pa.concat_tables([pq.read_table(p) for p in
                              sorted(glob.glob(f"{out}/*.parquet"))])
        assert t.num_rows == 6000
        from geomesa_ray.codecs import decode
        from geomesa_ray.sources.fixtures import gen_images_table

        t = t.sort_by("image_id")
        want = gen_images_table(6000)
        assert t.column("caption").equals(want.column("caption"))
        px = decode(t.column("bytes")[0].as_py(), "png")
        ref = np.frombuffer(want.column("bytes")[0].as_py(),
                            np.uint8).reshape(8, 8, 3)
        assert np.array_equal(px, ref)


class TestStatsKinds:
    def test_quantiles_and_describe(self, ray_session, capsys):
        assert main(["stats", "/root/testdata/sf0.001", "documents",
                     "n_chars", "--kind", "quantiles"]) == 0
        q = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert q["n"] == 500 and q["quantiles"]["0.5"] > 0
        assert main(["stats", "/root/testdata/sf0.001", "documents",
                     "n_chars", "--kind", "describe"]) == 0
        d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert d["n"] == 500 and d["min"] <= d["mean"] <= d["max"]
        # describe must agree with numpy exactly (population variance)
        import numpy as np
        import pyarrow.parquet as pq

        x = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                          columns=["n_chars"]).column("n_chars") \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        assert abs(d["mean"] - x.mean()) < 1e-9
        assert abs(d["variance"] - x.var()) < x.var() * 1e-9


class TestBlobCli:
    """blob-put / blob-get / blob-ids / blob-delete — the blobstore
    command-tool surface over state/blobstore.py."""

    def test_blob_lifecycle(self, ray_session, tmp_path, capsys):
        store = str(tmp_path / "bs")
        f = tmp_path / "photo.bin"
        f.write_bytes(b"\x01\x02\x03payload")
        assert main(["blob-put", store, str(f),
                     "--wkt", "POINT (10.5 -3.25)",
                     "--dtg-s", "1700000000"]) == 0
        bid = _json_out(capsys)["blob_id"]
        assert bid.startswith("photo_")

        out = tmp_path / "fetched.bin"
        assert main(["blob-get", store, bid, "--out", str(out)]) == 0
        assert out.read_bytes() == b"\x01\x02\x03payload"
        capsys.readouterr()

        assert main(["blob-ids", store,
                     "--bbox", "10,11,-4,-3"]) == 0
        lines = capsys.readouterr().out.strip().splitlines()
        assert lines == [f"{bid}\tphoto.bin"]
        assert main(["blob-ids", store, "--bbox", "50,51,0,1"]) == 0
        assert capsys.readouterr().out.strip() == ""

        assert main(["blob-delete", store, bid]) == 0
        assert _json_out(capsys)["deleted"] == 1
        assert main(["blob-get", store, bid]) == 2


class TestBlobHandlerCli:
    """Round-5: blob-put resolves geometry through the named handler
    registry (--handler exif reads the JPEG's own GPS directory)."""

    def test_blob_put_exif_handler(self, ray_session, tmp_path, capsys):
        import numpy as np

        from geomesa_ray.codecs.exif import insert_exif
        from geomesa_ray.codecs.jpeg import encode_jpeg

        img = np.full((8, 8, 3), 77, dtype=np.uint8)
        buf = insert_exif(encode_jpeg(img), -33.8568, 151.2153,
                          1700000000)
        f = tmp_path / "sydney.jpg"
        f.write_bytes(buf)
        store = str(tmp_path / "bs")
        assert main(["blob-put", store, str(f), "--handler", "exif",
                     "--dtg-s", "0"]) == 0
        bid = _json_out(capsys)["blob_id"]

        assert main(["blob-ids", store,
                     "--bbox", "151,152,-34,-33"]) == 0
        lines = capsys.readouterr().out.strip().splitlines()
        assert lines == [f"{bid}\tsydney.jpg"]

    def test_blob_put_exif_no_gps_is_error(self, ray_session, tmp_path,
                                           capsys):
        import numpy as np

        from geomesa_ray.codecs.jpeg import encode_jpeg

        f = tmp_path / "plain.jpg"
        f.write_bytes(encode_jpeg(np.full((8, 8, 3), 5, dtype=np.uint8)))
        assert main(["blob-put", str(tmp_path / "bs2"), str(f),
                     "--handler", "exif", "--dtg-s", "0"]) == 2
        assert "cannot process" in capsys.readouterr().err

    def test_blob_put_wkt_requires_wkt(self, ray_session, tmp_path,
                                       capsys):
        f = tmp_path / "x.bin"
        f.write_bytes(b"abc")
        assert main(["blob-put", str(tmp_path / "bs3"), str(f),
                     "--dtg-s", "0"]) == 2
        assert "--wkt is required" in capsys.readouterr().err


class TestBlobBulkCli:
    """Round-5: blob-put-bulk streams a directory through
    read_binary_files -> handler -> the Dataset-scale put."""

    def test_bulk_exif_dir(self, ray_session, tmp_path, capsys):
        import numpy as np

        from geomesa_ray.codecs.exif import insert_exif
        from geomesa_ray.codecs.jpeg import encode_jpeg

        src = tmp_path / "photos"
        src.mkdir()
        pts = [(10.0, 20.0), (11.0, 21.0), (12.0, 22.0)]
        for i, (lat, lon) in enumerate(pts):
            img = np.full((8, 8, 3), 30 + i, dtype=np.uint8)
            (src / f"p{i}.jpg").write_bytes(
                insert_exif(encode_jpeg(img), lat, lon, 1700000000 + i))
        (src / "plain.jpg").write_bytes(
            encode_jpeg(np.full((8, 8, 3), 9, dtype=np.uint8)))

        store = str(tmp_path / "bs")
        assert main(["blob-put-bulk", store, str(src),
                     "--handler", "exif"]) == 0
        stats = _json_out(capsys)
        assert stats["blobs"]["rows"] == 3  # GPS-less file skipped

        assert main(["blob-ids", store]) == 0
        lines = capsys.readouterr().out.strip().splitlines()
        assert sorted(ln.split("\t")[1] for ln in lines) \
            == ["p0.jpg", "p1.jpg", "p2.jpg"]

    def test_bulk_wkt_fixed_point(self, ray_session, tmp_path, capsys):
        src = tmp_path / "files"
        src.mkdir()
        for i in range(4):
            (src / f"f{i}.bin").write_bytes(bytes([i]) * 20)
        store = str(tmp_path / "bs2")
        assert main(["blob-put-bulk", store, str(src),
                     "--wkt", "POINT (5 6)", "--dtg-s", "7"]) == 0
        assert _json_out(capsys)["blobs"]["rows"] == 4

    def test_bulk_wkt_requires_wkt(self, ray_session, tmp_path, capsys):
        src = tmp_path / "d"
        src.mkdir()
        assert main(["blob-put-bulk", str(tmp_path / "bs3"),
                     str(src)]) == 2
        assert "--wkt is required" in capsys.readouterr().err
