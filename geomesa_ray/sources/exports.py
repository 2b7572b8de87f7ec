"""Export writers: csv, json, GeoJSON, BIN.

Reference parity: the CLI export formats (``ExportCommand.scala:122-123``:
csv, tsv, gml, json/GeoJSON, shp, bin). csv/json delegate to Ray Data's
partitioned writers (resumable: one file per block, a failed run re-runs
missing blocks); GeoJSON is a per-batch vectorized encoder emitting one
Feature per row; BIN lives in stages/bin_export.py.
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data


def export_csv(ds: ray.data.Dataset, out_dir: str) -> None:
    ds.write_csv(out_dir)


def export_json(ds: ray.data.Dataset, out_dir: str) -> None:
    ds.write_json(out_dir)


def geojson_batch(batch: pa.Table, lon_col: str = "lon", lat_col: str = "lat",
                  props: list[str] | None = None) -> pa.Table:
    """Encode rows as GeoJSON Feature strings (Point geometry)."""
    lon = batch.column(lon_col).to_pylist()
    lat = batch.column(lat_col).to_pylist()
    prop_cols = props if props is not None else [
        c for c in batch.schema.names if c not in (lon_col, lat_col)]
    pdata = {c: batch.column(c).to_pylist() for c in prop_cols}
    feats = []
    for i in range(batch.num_rows):
        feats.append(json.dumps({
            "type": "Feature",
            "geometry": {"type": "Point", "coordinates": [lon[i], lat[i]]},
            "properties": {c: pdata[c][i] for c in prop_cols},
        }, default=str, sort_keys=True))
    return pa.table({"feature": pa.array(feats, pa.string())})


def export_geojson(ds: ray.data.Dataset, out_dir: str, lon_col: str = "lon",
                   lat_col: str = "lat") -> None:
    ds.map_batches(lambda b: geojson_batch(b, lon_col, lat_col),
                   batch_format="pyarrow").write_json(out_dir)


def gml_batch(batch: pa.Table, lon_col: str = "lon", lat_col: str = "lat",
              type_name: str = "image", id_col: str = "image_id") -> pa.Table:
    """Encode rows as GML 2 featureMember fragments (Point geometry) —
    the CLI gml export analog (``ExportCommand.scala:122-123``)."""
    from xml.sax.saxutils import escape

    lon = batch.column(lon_col).to_pylist()
    lat = batch.column(lat_col).to_pylist()
    ids = batch.column(id_col).to_pylist()
    frags = []
    for i in range(batch.num_rows):
        frags.append(
            f'<gml:featureMember><{type_name} fid="{escape(str(ids[i]))}">'
            f"<gml:pointProperty><gml:Point srsName=\"EPSG:4326\">"
            f"<gml:coordinates>{lon[i]:.10g},{lat[i]:.10g}</gml:coordinates>"
            f"</gml:Point></gml:pointProperty></{type_name}></gml:featureMember>")
    return pa.table({"gml": pa.array(frags, pa.string())})


def export_gml(ds: ray.data.Dataset, out_dir: str, lon_col: str = "lon",
               lat_col: str = "lat") -> None:
    ds.map_batches(lambda b: gml_batch(b, lon_col, lat_col),
                   batch_format="pyarrow").write_json(out_dir)


class _ArrowIpcDatasink(ray.data.Datasink):
    """One ``.arrow`` (Feather V2, zstd) file per block. Part names are
    ``part-{task_idx}-{block_idx}-{content_digest}``: ``ctx.task_idx``
    is stable across Ray task retries, so a retried write task rewrites
    the SAME files (idempotent — no duplicate parts on read-back),
    while two distinct blocks that happen to hold identical content
    (duplicated corpus, low-cardinality projections) land in different
    tasks/block slots and BOTH survive. The content digest covers the
    full serialized IPC bytes — not just block edges — so no two
    different payloads can ever share a name either."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def on_write_start(self) -> None:
        import os

        os.makedirs(self.out_dir, exist_ok=True)

    def write(self, blocks, ctx) -> int:
        import hashlib
        import io
        import os

        import pyarrow.feather as feather

        from ray.data.block import BlockAccessor

        rows = 0
        for bi, block in enumerate(blocks):
            batch = BlockAccessor.for_block(block).to_arrow()
            buf = io.BytesIO()
            feather.write_feather(batch, buf, compression="zstd")
            data = buf.getvalue()
            digest = hashlib.sha1(data).hexdigest()[:16]
            name = f"part-{ctx.task_idx:05d}-{bi:04d}-{digest}.arrow"
            tmp = os.path.join(self.out_dir, "." + name)
            with open(tmp, "wb") as f:
                f.write(data)
            os.rename(tmp, os.path.join(self.out_dir, name))
            rows += batch.num_rows
        return rows


def export_arrow_ipc(ds: ray.data.Dataset, out_dir: str) -> None:
    """Partitioned Arrow IPC (Feather V2) export: one ``.arrow`` file
    per block, written by a custom :class:`ray.data.Datasink` (each
    write task streams its own blocks — resumable the same way the
    parquet/csv writers are). Arrow IPC is the zero-copy interchange
    the engine's own batches already use, so this is the lossless
    export (binary image payloads and map columns survive, which
    csv/json cannot carry)."""
    ds.write_datasink(_ArrowIpcDatasink(out_dir))


def read_arrow_ipc(out_dir: str) -> ray.data.Dataset:
    """Read back a partitioned Arrow IPC export directory."""
    import glob
    import os

    import pyarrow.feather as feather

    paths = sorted(glob.glob(os.path.join(out_dir, "*.arrow")))
    if not paths:
        raise FileNotFoundError(f"no .arrow files under {out_dir}")

    def load(row_batch: pa.Table) -> pa.Table:
        return feather.read_table(row_batch.column("path")[0].as_py())

    import ray

    ds = ray.data.from_items([{"path": p} for p in paths],
                             override_num_blocks=len(paths))
    return ds.map_batches(load, batch_format="pyarrow", batch_size=None)
