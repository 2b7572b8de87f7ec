"""Format converters: delimited-text / JSON ingest into the feature shape.

Reference parity: ``geomesa-convert`` pluggable ``SimpleFeatureConverter``s
(``DelimitedTextConverter.scala:23-96``, JSON/Avro/XML modules) parse
records and evaluate a field-extraction DSL into typed features. Here the
DSL is the vectorized transformer-function registry
(``geomesa_ray.functions``) applied per batch after ``ray.data.read_csv``
/ ``read_json``; the converter "spec" maps output columns to registry
expressions. Avro/XML have no sandbox parsers — gated with a clear error
(the plumbing is format-agnostic: any reader that yields Arrow batches
slots in).
"""

from __future__ import annotations

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


def avro_ingest(paths, spec: dict, **read_kwargs) -> ray.data.Dataset:
    """Avro converter — ray.data.read_avro exists but no avro codec ships
    in this sandbox; gated behind an import-try."""
    try:
        ds = ray.data.read_avro(paths, **read_kwargs)
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "avro ingest needs the 'fastavro' package (not in sandbox); "
            "the converter pipeline is identical to csv/json_ingest") from e
    return ds.map_batches(lambda b: transform_batch(b, spec),
                          batch_format="pyarrow")
