"""Format converters: delimited-text / JSON / Avro / XML / fixed-width
ingest into the feature shape.

Reference parity: ``geomesa-convert`` pluggable ``SimpleFeatureConverter``s
(``DelimitedTextConverter.scala:23-96``, and the
``geomesa-convert-{json,avro,xml,fixedwidth}`` modules) parse records and
evaluate a field-extraction DSL into typed features. Here the DSL is the
vectorized transformer-function registry (``geomesa_ray.functions``)
applied per batch after the format reader; the converter "spec" maps
output columns to registry expressions.

Readers: csv/json use Ray Data's native parquet-grade readers; Avro uses
the pure-Python container reader in ``sources/avro.py`` (one task per
file — Avro blocks are file-internal); XML parses with the stdlib
ElementTree per file; fixed-width slices line columns fully vectorized
(``pc.utf8_slice_codeunits``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from geomesa_ray.functions import transform_batch


def csv_ingest(paths, spec: dict, **read_kwargs) -> ray.data.Dataset:
    """read_csv -> converter spec -> feature columns."""
    ds = ray.data.read_csv(paths, **read_kwargs)
    return ds.map_batches(lambda b: transform_batch(b, spec),
                          batch_format="pyarrow")


def json_ingest(paths, spec: dict, **read_kwargs) -> ray.data.Dataset:
    """read_json (newline-delimited) -> converter spec -> features."""
    ds = ray.data.read_json(paths, **read_kwargs)
    return ds.map_batches(lambda b: transform_batch(b, spec),
                          batch_format="pyarrow")


def _per_file(paths) -> ray.data.Dataset:
    paths = [paths] if isinstance(paths, str) else list(paths)
    return ray.data.from_items([{"path": p} for p in paths],
                               override_num_blocks=len(paths))


def avro_ingest(paths, spec: dict | None = None) -> ray.data.Dataset:
    """Avro Object Container Files -> features: one task per file, each
    decoding its own blocks (geomesa-convert-avro role; pure-Python
    reader, spec-subset — see sources/avro.py)."""
    from geomesa_ray.sources.avro import read_avro_file

    def load(batch: pa.Table) -> pa.Table:
        t = pa.concat_tables([read_avro_file(p)
                              for p in batch.column("path").to_pylist()])
        return transform_batch(t, spec) if spec else t

    return _per_file(paths).map_batches(load, batch_format="pyarrow",
                                        batch_size=None)


def xml_ingest(paths, record_tag: str, fields: dict,
               spec: dict | None = None) -> ray.data.Dataset:
    """XML files -> features (geomesa-convert-xml role): one task per
    file; ``record_tag`` selects record elements (ElementTree ``iter``),
    ``fields`` maps output name -> child-element tag or ``"@attr"``.
    Per-record parsing matches the reference's converter granularity."""
    import xml.etree.ElementTree as ET

    def load(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {name: [] for name in fields}
        for p in batch.column("path").to_pylist():
            root = ET.parse(p).getroot()
            for rec in root.iter(record_tag):
                for name, sel in fields.items():
                    if sel.startswith("@"):
                        cols[name].append(rec.get(sel[1:]))
                    else:
                        el = rec.find(sel)
                        cols[name].append(None if el is None else el.text)
        t = pa.table({k: pa.array(v, pa.string()) for k, v in cols.items()})
        return transform_batch(t, spec) if spec else t

    return _per_file(paths).map_batches(load, batch_format="pyarrow",
                                        batch_size=None)


def fixed_width_ingest(paths, fields: dict,
                       spec: dict | None = None) -> ray.data.Dataset:
    """Fixed-width text -> features (geomesa-convert-fixedwidth role):
    ``fields`` maps output name -> (start, width[, type]) character
    columns. Slicing is fully vectorized over the line batch
    (utf8_slice_codeunits + trim + cast) — no per-row Python."""

    def parse(batch: pa.Table) -> pa.Table:
        lines = batch.column("text")
        cols = {}
        for name, f in fields.items():
            start, width = f[0], f[1]
            typ = f[2] if len(f) > 2 else "string"
            s = pc.utf8_trim_whitespace(
                pc.utf8_slice_codeunits(lines, start, start + width))
            if typ in ("int", "double"):
                # short/ragged lines slice to '' — null the field out
                # (converter convention) instead of aborting on the cast
                s = pc.if_else(pc.equal(s, ""),
                               pa.scalar(None, pa.string()), s)
                s = s.cast(pa.int64() if typ == "int" else pa.float64())
            cols[name] = s
        t = pa.table(cols)
        return transform_batch(t, spec) if spec else t

    ds = ray.data.read_text(paths)
    return ds.map_batches(parse, batch_format="pyarrow", batch_size=65536)
