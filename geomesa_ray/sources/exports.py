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
