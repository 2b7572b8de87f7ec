"""Lance read-path coverage (VERDICT r02 item #10).

The north-star storage format is Lance; this sandbox ships only parquet,
so two layers are tested:

1. DISPATCH — ``read_images`` must route to ``ray.data.read_lance`` with
   the pruned column projection whenever the lance package AND an
   ``images.lance`` dataset are present (exercised here by stubbing the
   gate, no package needed).
2. ROUND-TRIP — a real write/read through lance, skipped cleanly when
   the package is absent (runs wherever lance is installed).
"""

import os

import pyarrow as pa
import pytest

import geomesa_ray.sources.io as io_mod


class TestLanceDispatch:
    def test_read_images_routes_to_lance(self, tmp_path, monkeypatch):
        fdir = str(tmp_path)
        os.makedirs(os.path.join(fdir, "images.lance"))
        calls = {}

        def fake_read_lance(path, columns=None, **kw):
            calls["path"] = path
            calls["columns"] = columns
            return "LANCE_DS"

        monkeypatch.setattr(io_mod, "HAVE_LANCE", True)
        monkeypatch.setattr(io_mod.ray.data, "read_lance", fake_read_lance,
                            raising=False)
        out = io_mod.read_images(fdir, columns=["image_id", "phash"])
        assert out == "LANCE_DS"
        assert calls["path"].endswith("images.lance")
        assert calls["columns"] == ["image_id", "phash"]  # pruned read

    def test_parquet_fallback_without_lance(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        fdir = str(tmp_path)
        t = pa.table({"image_id": pa.array(["a", "b"]),
                      "phash": pa.array([1, 2], pa.int64())})
        pq.write_table(t, os.path.join(fdir, "images.parquet"))
        ds = io_mod.read_images(fdir, columns=["image_id"])
        assert [r["image_id"] for r in ds.take_all()] == ["a", "b"]


@pytest.mark.skipif(not io_mod.HAVE_LANCE, reason="lance not installed")
class TestLanceRoundTrip:
    def test_write_read_round_trip(self, ray_session, tmp_path):
        import lance

        t = pa.table({"image_id": pa.array(["a", "b", "c"]),
                      "phash": pa.array([7, -3, 0], pa.int64()),
                      "caption": pa.array(["x", "y", "z"])})
        path = os.path.join(str(tmp_path), "images.lance")
        lance.write_dataset(t, path)
        ds = io_mod.read_images(str(tmp_path), columns=["image_id", "phash"])
        rows = sorted(ds.take_all(), key=lambda r: r["image_id"])
        assert [r["phash"] for r in rows] == [7, -3, 0]
