"""Transformer-function registry: the converter DSL's scalar functions.

Reference parity: ``geomesa-convert/.../Transformers.scala:363-586``
defines ~50 pluggable scalar functions (string ops, date parsers,
geometry constructors, casts, hashes) resolved by name, with an SPI for
user extensions (``TransformerFunctionFactory``, ``Transformers.scala:359-361``).

Here each function is a VECTORIZED kernel: name -> callable taking
(pyarrow.Table, *column-or-literal args) and returning a pyarrow Array.
A transform spec ``{out_col: (fn_name, args...)}`` is applied per batch by
:func:`transform_batch` inside ``map_batches`` — the Ray-Data analog of
the reference's per-feature transform/projection evaluation
(``QueryPlanner.setQueryTransforms``, ``QueryPlanner.scala:279-345``).

User extension = :func:`register` (plain-Python entry-point registry).
String kernels use pyarrow.compute so semantics match the DuckDB oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FUNCTIONS: dict = {}


def register(name: str):
    def deco(fn):
        FUNCTIONS[name] = fn
        return fn

    return deco


def _col(batch: pa.Table, ref):
    """Resolve an argument: 'col:name' -> column; anything else literal."""
    if isinstance(ref, str) and ref.startswith("col:"):
        c = batch.column(ref[4:])
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    return ref


# ---- string functions (Transformers.scala: trim/capitalize/concat/...)

@register("trim")
def _trim(batch, a):
    return pc.utf8_trim_whitespace(_col(batch, a))


@register("lowercase")
def _lower(batch, a):
    return pc.utf8_lower(_col(batch, a))


@register("uppercase")
def _upper(batch, a):
    return pc.utf8_upper(_col(batch, a))


@register("capitalize")
def _capitalize(batch, a):
    return pc.utf8_capitalize(_col(batch, a))


@register("concat")
def _concat(batch, *args):
    cols = [_col(batch, a) for a in args]
    n = batch.num_rows
    cols = [c if isinstance(c, pa.Array) else pa.array([str(c)] * n) for c in cols]
    return pc.binary_join_element_wise(*cols, "")


@register("substr")
def _substr(batch, a, start, stop):
    return pc.utf8_slice_codeunits(_col(batch, a), start, stop)


@register("regexReplace")
def _regex_replace(batch, a, pattern, replacement):
    return pc.replace_substring_regex(_col(batch, a), pattern=pattern,
                                      replacement=replacement)


@register("strlen")
def _strlen(batch, a):
    return pc.utf8_length(_col(batch, a)).cast(pa.int64())


# ---- casts / arithmetic

@register("toInt")
def _to_int(batch, a):
    return _col(batch, a).cast(pa.int64())


@register("toDouble")
def _to_double(batch, a):
    return _col(batch, a).cast(pa.float64())


@register("toString")
def _to_string(batch, a):
    return _col(batch, a).cast(pa.string())


@register("add")
def _add(batch, a, b):
    return pc.add(_col(batch, a), _col(batch, b))


@register("multiply")
def _multiply(batch, a, b):
    return pc.multiply(_col(batch, a), _col(batch, b))


# ---- dates (reference date parser family)

@register("dateToString")
def _date_to_string(batch, a):
    ts = _col(batch, a).cast(pa.int64()).to_numpy(zero_copy_only=False)
    days = (ts // 86_400_000_000).astype("datetime64[D]").astype("U10")
    return pa.array(days.tolist(), pa.string())


@register("secsToDate")
def _secs_to_date(batch, a):
    secs = _col(batch, a)
    return pc.multiply(secs.cast(pa.int64()), 1_000_000).cast(pa.timestamp("us"))


# ---- hashes / ids (md5/murmur/uuid family)

@register("md5")
def _md5(batch, a):
    vals = _col(batch, a).to_pylist()
    return pa.array([hashlib.md5(str(v).encode()).hexdigest() for v in vals],
                    pa.string())


@register("hash_mod")
def _hash_mod(batch, a, mod):
    """HashAttributeProcess analog (HashAttributeProcess.scala:56-95):
    stable integer hash of an attribute, bucketed by ``mod``."""
    from geomesa_ray.sources.fixtures import splitmix64

    col = _col(batch, a)
    if pa.types.is_integer(col.type):
        h = splitmix64(col.to_numpy(zero_copy_only=False).view(np.uint64))
    else:
        import zlib

        h = splitmix64(np.array([zlib.crc32(str(v).encode())
                                 for v in col.to_pylist()], dtype=np.uint64))
    return pa.array((h % np.uint64(mod)).astype(np.int64))


# ---- geometry constructors (point/wkt family)

@register("point_wkt")
def _point_wkt(batch, lon, lat):
    x = _col(batch, lon).to_numpy(zero_copy_only=False)
    y = _col(batch, lat).to_numpy(zero_copy_only=False)
    return pa.array([f"POINT ({a:.10g} {b:.10g})" for a, b in zip(x, y)],
                    pa.string())


def transform_batch(batch: pa.Table, spec: dict) -> pa.Table:
    """Apply a transform spec {out_col: (fn, args...) | 'col:name'}."""
    cols = {}
    for out, expr in spec.items():
        if isinstance(expr, str):
            cols[out] = _col(batch, expr)
        else:
            fn = FUNCTIONS[expr[0]]
            cols[out] = fn(batch, *expr[1:])
    return pa.table(cols)
