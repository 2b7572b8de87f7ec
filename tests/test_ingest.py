"""Format converters: Avro container round-trip, XML, fixed-width, DMS.

Reference parity: geomesa-convert-{avro,xml,fixedwidth} modules; the
Avro reader implements the public container spec directly (pure Python,
no codec library).
"""

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.functions.registry import transform_batch

SCHEMA = {
    "type": "record", "name": "obs",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "lon", "type": "double"},
        {"name": "lat", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "note", "type": ["null", "string"]},
        {"name": "payload", "type": "bytes"},
    ],
}


def _rows(n=250):
    return [
        dict(id=i, name=f"obs{i}", lon=-180.0 + i * 1.3, lat=(i % 170) - 85.0,
             flag=i % 3 == 0, note=None if i % 4 == 0 else f"n{i}",
             payload=bytes([i % 256, (i * 7) % 256]))
        for i in range(n)
    ]


class TestAvro:
    @pytest.mark.parametrize("codec", ["null", "deflate"])
    def test_roundtrip(self, tmp_path, codec):
        from geomesa_ray.sources.avro import read_avro_file, write_avro_file

        rows = _rows()
        p = str(tmp_path / f"obs_{codec}.avro")
        write_avro_file(p, SCHEMA, rows, codec=codec, block_rows=64)
        t = read_avro_file(p)
        assert t.num_rows == len(rows)
        got = t.to_pylist()
        for g, w in zip(got, rows):
            assert g == w

    def test_negative_zigzag(self, tmp_path):
        from geomesa_ray.sources.avro import read_avro_file, write_avro_file

        sch = {"type": "record", "name": "r",
               "fields": [{"name": "v", "type": "long"}]}
        vals = [0, -1, 1, -2, 2**40, -(2**40), 2**62, -(2**62)]
        p = str(tmp_path / "neg.avro")
        write_avro_file(p, sch, [{"v": v} for v in vals])
        assert read_avro_file(p).column("v").to_pylist() == vals

    def test_avro_ingest_distributed(self, ray_session, tmp_path):
        from geomesa_ray.sources.avro import write_avro_file
        from geomesa_ray.sources.ingest import avro_ingest

        paths = []
        for f in range(3):
            p = str(tmp_path / f"part{f}.avro")
            write_avro_file(p, SCHEMA, _rows(100), codec="deflate")
            paths.append(p)
        ds = avro_ingest(paths, spec={
            "id": "col:id", "upper": ("uppercase", "col:name")})
        rows = ds.take_all()
        assert len(rows) == 300
        assert rows[0]["upper"].startswith("OBS")

    def test_unsupported_schema_raises(self, tmp_path):
        from geomesa_ray.sources.avro import read_avro_file, write_avro_file

        # arrays are outside the supported subset: writer refuses
        sch = {"type": "record", "name": "r",
               "fields": [{"name": "v",
                           "type": {"type": "array", "items": "long"}}]}
        with pytest.raises(NotImplementedError):
            write_avro_file(str(tmp_path / "x.avro"), sch, [{"v": [1]}])


class TestXml:
    def test_xml_ingest(self, ray_session, tmp_path):
        from geomesa_ray.sources.ingest import xml_ingest

        p = str(tmp_path / "obs.xml")
        with open(p, "w") as f:
            f.write("""<root>
              <obs id="a1"><lon>10.5</lon><lat>-3.25</lat></obs>
              <obs id="a2"><lon>-120.0</lon><lat>45.0</lat></obs>
            </root>""")
        ds = xml_ingest([p], "obs",
                        fields={"oid": "@id", "lon_s": "lon", "lat_s": "lat"},
                        spec={"oid": "col:oid",
                              "lon": ("toDouble", "col:lon_s"),
                              "lat": ("toDouble", "col:lat_s")})
        rows = sorted(ds.take_all(), key=lambda r: r["oid"])
        assert rows == [{"oid": "a1", "lon": 10.5, "lat": -3.25},
                        {"oid": "a2", "lon": -120.0, "lat": 45.0}]


class TestFixedWidth:
    def test_fixed_width_ingest(self, ray_session, tmp_path):
        from geomesa_ray.sources.ingest import fixed_width_ingest

        p = str(tmp_path / "fw.txt")
        with open(p, "w") as f:
            f.write("alpha     42  10.50\n")
            f.write("beta     107  -3.25\n")
        ds = fixed_width_ingest([p], fields={
            "name": (0, 8),
            "count": (8, 5, "int"),
            "val": (13, 7, "double"),
        })
        rows = sorted(ds.take_all(), key=lambda r: r["name"])
        assert rows == [
            {"name": "alpha", "count": 42, "val": 10.5},
            {"name": "beta", "count": 107, "val": -3.25},
        ]


class TestDms:
    def test_dms_to_degrees(self):
        t = pa.table({"s": pa.array([
            "34°12'30\"N", "34:12:30 S", "-34 12 30", "118°30'0\"W",
            "not a coord"])})
        out = transform_batch(t, {"deg": ("dmsToDegrees", "col:s")})
        got = out.column("deg").to_pylist()
        want = 34 + 12 / 60 + 30 / 3600
        assert abs(got[0] - want) < 1e-12
        assert abs(got[1] + want) < 1e-12
        assert abs(got[2] + want) < 1e-12
        assert abs(got[3] + 118.5) < 1e-12
        assert got[4] is None


class TestShapefile:
    def test_point_roundtrip_vectorized(self, tmp_path):
        from geomesa_ray.sources.shapefile import read_shapefile, write_shapefile

        pts = [(-150.0 + i * 1.7, -80.0 + i * 0.9) for i in range(200)]
        p = str(tmp_path / "pts.shp")
        write_shapefile(p, "point", pts,
                        attrs={"pid": list(range(200)),
                               "name": [f"p{i}" for i in range(200)]})
        t = read_shapefile(p)
        assert t.num_rows == 200
        assert t.column("lon").to_pylist() == [x for x, _ in pts]
        assert t.column("lat").to_pylist() == [y for _, y in pts]
        assert t.column("pid").to_pylist() == list(range(200))
        assert t.column("name")[5].as_py() == "p5"

    def test_polygon_with_hole_feeds_join_surface(self, tmp_path):
        from geomesa_ray.geom.wkt import parse_wkt_geometry
        from geomesa_ray.sources.shapefile import read_shapefile, write_shapefile

        shell = [(-30.0, -20.0), (10.0, -20.0), (10.0, 20.0), (-30.0, 20.0),
                 (-30.0, -20.0)]
        hole = [(-20.0, -10.0), (0.0, -10.0), (0.0, 10.0), (-20.0, 10.0),
                (-20.0, -10.0)]
        p = str(tmp_path / "poly.shp")
        write_shapefile(p, "poly", [[shell, hole]],
                        attrs={"rid": ["r0"]})
        t = read_shapefile(p)
        kind, parts = parse_wkt_geometry(t.column("wkt")[0].as_py())
        assert kind == "poly" and len(parts[0]) == 2  # shell + hole survive

    def test_polyline(self, tmp_path):
        from geomesa_ray.geom.wkt import parse_wkt_geometry
        from geomesa_ray.sources.shapefile import read_shapefile, write_shapefile

        line = [(-150.0, -40.0), (-130.0, -20.0), (-110.0, -25.0)]
        p = str(tmp_path / "line.shp")
        write_shapefile(p, "line", [line])
        t = read_shapefile(p)
        kind, parts = parse_wkt_geometry(t.column("wkt")[0].as_py())
        assert kind == "line" and len(parts[0][0]) == 3

    def test_distributed_ingest(self, ray_session, tmp_path):
        from geomesa_ray.sources.shapefile import shapefile_ingest, write_shapefile

        for f in range(2):
            write_shapefile(str(tmp_path / f"f{f}.shp"), "point",
                            [(float(f * 10 + i), float(i)) for i in range(50)],
                            attrs={"pid": list(range(50))})
        ds = shapefile_ingest([str(tmp_path / "f0.shp"),
                               str(tmp_path / "f1.shp")])
        assert ds.count() == 100


class TestReviewRegressions:
    def test_avro_logical_type_annotation(self, tmp_path):
        """Dict-annotated primitives (logicalType timestamp-millis — the
        standard Avro timestamp encoding) must round-trip."""
        from geomesa_ray.sources.avro import read_avro_file, write_avro_file

        sch = {"type": "record", "name": "r", "fields": [
            {"name": "ts", "type": {"type": "long",
                                    "logicalType": "timestamp-millis"}},
            {"name": "v", "type": "double"}]}
        rows = [{"ts": 1704067200000 + i, "v": float(i)} for i in range(5)]
        p = str(tmp_path / "lt.avro")
        write_avro_file(p, sch, rows)
        t = read_avro_file(p)
        assert t.column("ts").to_pylist() == [r["ts"] for r in rows]

    def test_multipart_polyline_raises(self, tmp_path):
        import struct

        from geomesa_ray.sources.shapefile import (
            SHAPE_POLYLINE,
            read_shp,
            write_shapefile,
        )

        # hand-build a 2-part polyline record
        pts = [(0.0, 0.0), (1.0, 1.0), (5.0, 5.0), (6.0, 6.0)]
        body = struct.pack("<idddd", SHAPE_POLYLINE, 0.0, 0.0, 6.0, 6.0)
        body += struct.pack("<ii", 2, 4) + struct.pack("<2i", 0, 2)
        for x, y in pts:
            body += struct.pack("<dd", x, y)
        content = struct.pack(">ii", 1, len(body) // 2) + body
        header = struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0,
                             (100 + len(content)) // 2)
        header += struct.pack("<ii", 1000, SHAPE_POLYLINE)
        header += struct.pack("<8d", 0, 0, 6, 6, 0, 0, 0, 0)
        p = str(tmp_path / "mp.shp")
        with open(p, "wb") as f:
            f.write(header + content)
        import pytest

        with pytest.raises(NotImplementedError):
            read_shp(p)

    def test_point_file_with_null_shape_raises(self, tmp_path):
        import struct

        from geomesa_ray.sources.shapefile import read_shp, write_shapefile

        p = str(tmp_path / "nullpt.shp")
        write_shapefile(p, "point", [(1.0, 2.0), (3.0, 4.0)])
        # append a null-shape record (type 0): irregular stride
        with open(p, "ab") as f:
            f.write(struct.pack(">ii", 3, 2) + struct.pack("<i", 0))
        import pytest

        with pytest.raises(NotImplementedError):
            read_shp(p)


class TestParseMapMalformed:
    def test_entry_without_delim_nulls_value(self):
        import pyarrow as pa

        from geomesa_ray.functions.registry import transform_batch

        t = pa.table({"s": pa.array(["a->1,b", "c->3"])})
        out = transform_batch(t, {"m": ("parseMap", "col:s")})
        assert out.column("m").to_pylist() == [
            [("a", 1), ("b", None)], [("c", 3)]]

    def test_base64_null_propagation(self):
        import pyarrow as pa

        from geomesa_ray.functions.registry import transform_batch

        t = pa.table({"s": pa.array(["x", None], pa.string())})
        enc = transform_batch(t, {"b": ("base64Encode", "col:s")})
        assert enc.column("b").to_pylist() == ["eA==", None]
        dec = transform_batch(enc, {"r": ("base64Decode", "col:b")})
        assert dec.column("r").to_pylist() == [b"x", None]


class TestShapefileRingOrder:
    """ESRI orders rings by WINDING only: outer=CW, hole=CCW; ring 0
    need not be the shell and multiple outer rings are legal."""

    def test_hole_listed_first(self, tmp_path):
        from geomesa_ray.geom.wkt import parse_wkt_geometry
        from geomesa_ray.sources.shapefile import read_shp, write_shapefile

        # CW shell (ESRI outer), CCW hole — listed HOLE FIRST
        shell_cw = [(-30.0, -20.0), (-30.0, 20.0), (10.0, 20.0),
                    (10.0, -20.0), (-30.0, -20.0)]
        hole_ccw = [(-20.0, -10.0), (0.0, -10.0), (0.0, 10.0),
                    (-20.0, 10.0), (-20.0, -10.0)]
        p = str(tmp_path / "holefirst.shp")
        write_shapefile(p, "poly", [[hole_ccw, shell_cw]])
        t = read_shp(p)
        kind, parts = parse_wkt_geometry(t.column("wkt")[0].as_py())
        assert kind == "poly" and len(parts[0]) == 2
        shell = parts[0][0]
        # ring 0 of the parsed WKT must be the SHELL (bbox spans it)
        assert shell.bbox == (-30.0, 10.0, -20.0, 20.0)

    def test_two_outer_rings_become_multipolygon(self, tmp_path):
        from geomesa_ray.geom.wkt import parse_wkt_geometry
        from geomesa_ray.sources.shapefile import read_shp, write_shapefile

        a_cw = [(0.0, 0.0), (0.0, 5.0), (5.0, 5.0), (5.0, 0.0), (0.0, 0.0)]
        b_cw = [(20.0, 0.0), (20.0, 5.0), (25.0, 5.0), (25.0, 0.0),
                (20.0, 0.0)]
        p = str(tmp_path / "twoouter.shp")
        write_shapefile(p, "poly", [[a_cw, b_cw]])
        t = read_shp(p)
        kind, parts = parse_wkt_geometry(t.column("wkt")[0].as_py())
        assert kind == "multipoly" and len(parts) == 2


class TestArrowIpcExport:
    def test_roundtrip_lossless(self, ray_session, tiny_fixtures,
                                tmp_path):
        """Arrow IPC is the LOSSLESS export: binary payloads and
        captions survive byte-identically (csv/json cannot carry
        them); partitioned one file per block, resumable layout."""
        import glob

        import pyarrow as pa

        from geomesa_ray.sources.exports import (export_arrow_ipc,
                                                 read_arrow_ipc)
        from geomesa_ray.sources.fixtures import gen_images_table
        from geomesa_ray.sources.io import read_images

        out = str(tmp_path / "ipc")
        export_arrow_ipc(read_images(tiny_fixtures), out)
        assert glob.glob(f"{out}/*.arrow")
        assert not glob.glob(f"{out}/.*.arrow")  # no tmp leftovers
        t = pa.concat_tables(
            [pa.table(b) for b in read_arrow_ipc(out).iter_batches(
                batch_format="pyarrow", batch_size=8192)]) \
            .sort_by("image_id")
        want = gen_images_table(6000)
        assert t.column("bytes").equals(want.column("bytes"))
        assert t.column("caption").equals(want.column("caption"))
        assert t.column("phash").equals(want.column("phash"))

    def test_identical_blocks_both_survive(self, ray_session, tmp_path):
        """Two distinct blocks with byte-identical content (duplicated
        corpus) must BOTH survive the export — the part name
        disambiguates by task/block slot, not content alone (round-3
        advisor finding: edge-hash names silently dropped one)."""
        import pyarrow as pa
        import ray

        from geomesa_ray.sources.exports import (export_arrow_ipc,
                                                 read_arrow_ipc)

        tbl = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                        "text": pa.array(["same"] * 100)})
        ds = ray.data.from_arrow([tbl, tbl])
        out = str(tmp_path / "ipc_dup")
        export_arrow_ipc(ds, out)
        assert read_arrow_ipc(out).count() == 200

    def test_rewrite_same_slot_is_idempotent(self, ray_session,
                                             tmp_path):
        """Re-running the same export over the same data (the retry /
        resume case) rewrites the same part files instead of
        accumulating duplicates."""
        import glob

        import pyarrow as pa
        import ray

        from geomesa_ray.sources.exports import (export_arrow_ipc,
                                                 read_arrow_ipc)

        tbl = pa.table({"doc_id": pa.array(range(50), pa.int64())})
        out = str(tmp_path / "ipc_retry")
        export_arrow_ipc(ray.data.from_arrow([tbl]), out)
        first = sorted(glob.glob(f"{out}/*.arrow"))
        export_arrow_ipc(ray.data.from_arrow([tbl]), out)
        assert sorted(glob.glob(f"{out}/*.arrow")) == first
        assert read_arrow_ipc(out).count() == 50
