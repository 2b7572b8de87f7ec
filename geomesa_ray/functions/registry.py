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


@register("subtract")
def _subtract(batch, a, b):
    return pc.subtract(_col(batch, a), _col(batch, b))


@register("divide")
def _divide(batch, a, b):
    return pc.divide(_col(batch, a), _col(batch, b))


@register("mod")
def _mod(batch, a, b):
    va = _col(batch, a).to_numpy(zero_copy_only=False)
    return pa.array(va % _col(batch, b))


@register("abs")
def _abs(batch, a):
    return pc.abs(_col(batch, a))


@register("negate")
def _negate(batch, a):
    return pc.negate(_col(batch, a))


@register("min")
def _min(batch, a, b):
    return pc.min_element_wise(_col(batch, a), _col(batch, b))


@register("max")
def _max(batch, a, b):
    return pc.max_element_wise(_col(batch, a), _col(batch, b))


@register("toLong")
def _to_long(batch, a):
    return _col(batch, a).cast(pa.int64())


@register("toBoolean")
def _to_boolean(batch, a):
    c = _col(batch, a)
    if pa.types.is_string(c.type):
        return pc.equal(pc.utf8_lower(c), "true")
    return c.cast(pa.bool_())


@register("replace")
def _replace(batch, a, pattern, replacement):
    return pc.replace_substring(_col(batch, a), pattern=pattern,
                                replacement=replacement)


@register("indexOf")
def _index_of(batch, a, needle):
    return pc.find_substring(_col(batch, a), pattern=needle).cast(pa.int64())


@register("padLeft")
def _pad_left(batch, a, width, fill):
    return pc.utf8_lpad(_col(batch, a), width, padding=fill)


@register("emptyToNull")
def _empty_to_null(batch, a):
    c = _col(batch, a)
    return pc.if_else(pc.equal(c, ""), pa.scalar(None, c.type), c)


@register("regexExtract")
def _regex_extract(batch, a, pattern):
    """First capture-group match (RE2 — identical to DuckDB
    regexp_extract(col, pattern, 1)). Arrow requires named groups; an
    unnamed first group is converted, no group wraps the whole pattern."""
    import re as _re

    if "(?P<" not in pattern:
        # first UNESCAPED capturing paren (an escaped literal '\(' or a
        # '(?:' group must not be rewritten)
        if _re.search(r"(?<!\\)\((?!\?)", pattern):
            pattern = _re.sub(r"(?<!\\)\((?!\?)", "(?P<g>", pattern, count=1)
        else:
            pattern = f"(?P<g>{pattern})"
    s = pc.extract_regex(_col(batch, a), pattern=pattern)
    field = s.type[0].name
    return pc.struct_field(s, field)


# ---- collection types (SimpleFeatureTypes.scala:206-213 List[T]/Map[K,V];
# Transformers.scala:495-551 parseList/parseMap) — REAL arrow list/map
# columns, built vectorized from delimited strings


@register("parseList")
def _parse_list(batch, a, delim=",", value_type="string"):
    """'a,b,c' -> list<T> (pc.split_pattern, then an element-wise cast);
    empty/null input -> null (the reference's converters likewise null
    out unparseable attributes)."""
    c = _col(batch, a)
    c = pc.if_else(pc.equal(c, ""), pa.scalar(None, pa.string()), c)
    lst = pc.split_pattern(c, pattern=delim)
    if value_type == "int":
        return lst.cast(pa.list_(pa.int64()))
    if value_type == "double":
        return lst.cast(pa.list_(pa.float64()))
    return lst


@register("parseMap")
def _parse_map(batch, a, entry_delim=",", kv_delim="->",
               value_type="int"):
    """'k1->v1,k2->v2' -> map<string, T>, fully vectorized: split entries,
    flatten, split k/v, rebuild with the original list offsets."""
    c = _col(batch, a)
    c = pc.if_else(pc.equal(c, ""), pa.scalar(None, pa.string()), c)
    entries = pc.split_pattern(c, pattern=entry_delim)
    if isinstance(entries, pa.ChunkedArray):
        entries = entries.combine_chunks()
    flat = pc.list_flatten(entries)
    kv = pc.split_pattern(flat, pattern=kv_delim, max_splits=1)
    null_in = pc.is_null(c).to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(kv).to_numpy(zero_copy_only=False)
    if (lens < 2).any():
        # malformed entry (no key-value delimiter): null the VALUE out
        # instead of aborting the batch (converter null-out convention).
        # Rare path -> per-entry Python is fine here.
        keys_py, vals_py = [], []
        for e in flat.to_pylist():
            if e is None or kv_delim not in e:
                keys_py.append(e)
                vals_py.append(None)
            else:
                k, v = e.split(kv_delim, 1)
                keys_py.append(k)
                vals_py.append(v)
        keys = pa.array(keys_py, pa.string())
        vals = pa.array(vals_py, pa.string())
    else:
        keys = pc.list_element(kv, 0)
        vals = pc.list_element(kv, 1)
    if value_type == "int":
        vals = vals.cast(pa.int64())
    elif value_type == "double":
        vals = vals.cast(pa.float64())
    # null/empty input -> NULL map, not {} (a null START offset nulls
    # the row) — matches parseList's null-out convention
    offs_np = entries.offsets.to_numpy(zero_copy_only=False)
    omask = np.zeros(len(offs_np), dtype=bool)
    omask[:-1] = null_in
    offsets = pa.array(offs_np, pa.int32(), mask=omask)
    return pa.MapArray.from_arrays(offsets, keys, vals)


@register("jsonMap")
def _json_map(batch, a, value_type="int"):
    """JSON object string -> map<string, T> (per-record json parse — the
    converter path; the reference's JSON converter is likewise
    per-record, ``geomesa-convert-json``)."""
    import json

    vt = pa.int64() if value_type == "int" else (
        pa.float64() if value_type == "double" else pa.string())
    offsets: list = [0]
    null_rows: list = []
    keys: list = []
    vals: list = []
    cast = ((lambda v: int(str(v))) if value_type == "int"
            else float if value_type == "double" else str)
    for i, v in enumerate(_col(batch, a).to_pylist()):
        if v is None or v == "":
            null_rows.append(i)  # null input -> NULL map (not {})
            offsets.append(len(keys))
            continue
        # malformed JSON / non-castable values null the ROW, not the
        # batch (converter convention — parseList/parseMap/fixed_width
        # match); a JSON null VALUE stays a null map entry, it is not a
        # parse failure and must not drop the row's other entries
        try:
            obj = json.loads(v)
            if not isinstance(obj, dict):
                raise ValueError("not a JSON object")
            kv = [(str(k), None if val is None else cast(val))
                  for k, val in obj.items()]
        except (ValueError, TypeError):
            null_rows.append(i)
            offsets.append(len(keys))
            continue
        for k, val in kv:
            keys.append(k)
            vals.append(val)
        offsets.append(len(keys))
    # a null START offset nulls that row (values buffer keeps the ints)
    mask = np.zeros(len(offsets), dtype=bool)
    mask[null_rows] = True
    return pa.MapArray.from_arrays(
        pa.array(np.array(offsets, dtype=np.int32), pa.int32(), mask=mask),
        pa.array(keys, pa.string()),
        pa.array(vals, vt))


@register("listItem")
def _list_item(batch, a, i):
    return pc.list_element(_col(batch, a), i)


@register("listSize")
def _list_size(batch, a):
    return pc.list_value_length(_col(batch, a)).cast(pa.int64())


def map_offsets(m: pa.MapArray) -> np.ndarray:
    """Entry offsets of a MapArray as plain int64 (read from the raw
    offsets buffer — safe with null rows, whose values would otherwise
    degrade to NaN through to_numpy). Null rows span zero entries in
    every builder in this codebase."""
    return np.frombuffer(m.buffers()[1], dtype=np.int32)[
        m.offset:m.offset + len(m) + 1].astype(np.int64)


@register("mapValue")
def _map_value(batch, a, key):
    """map lookup by key -> value (null when absent), vectorized over the
    flattened entries."""
    m = _col(batch, a)
    if isinstance(m, pa.ChunkedArray):
        m = m.combine_chunks()
    elif m.offset != 0:
        # a SLICED MapArray's .keys/.items return the full child arrays;
        # rebuild zero-offset so entry positions align with map_offsets
        m = pa.concat_arrays([m])
    keys = m.keys
    items = m.items
    hit = pc.equal(keys, key).to_numpy(zero_copy_only=False)
    offs = map_offsets(m)
    # mask hits outside this array's entry window (full-child artifacts)
    n = len(m)
    out_idx = np.full(n, -1, dtype=np.int64)
    hit_pos = np.nonzero(hit)[0]
    hit_pos = hit_pos[(hit_pos >= offs[0]) & (hit_pos < offs[-1])]
    row_of = np.searchsorted(offs[1:], hit_pos, side="right")
    out_idx[row_of] = hit_pos  # last match per row wins (dup keys rare)
    valid = out_idx >= 0
    if len(items) == 0 or not valid.any():
        # a batch of only null/empty maps: no entries to take from
        return pa.array([None] * n, items.type)
    taken = items.take(pa.array(np.where(valid, out_idx, 0)))
    return pc.if_else(pa.array(valid), taken,
                      pa.scalar(None, items.type))


@register("isoDateToMillis")
def _iso_date_to_millis(batch, a):
    """ISO-8601 date OR datetime string -> epoch millis (UTC),
    vectorized: date-only values are padded to midnight, then one
    strptime pass; unparseable rows null out (converter convention)."""
    c = _col(batch, a)
    if not pa.types.is_string(c.type):
        return c.cast(pa.timestamp("ms")).cast(pa.int64())
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    pad = pa.array(["T00:00:00"] * len(c), pa.string())
    padded = pc.if_else(pc.equal(pc.utf8_length(c), 10),
                        pc.binary_join_element_wise(c, pad, ""), c)
    ts = pc.strptime(pc.utf8_slice_codeunits(padded, 0, 19),
                     format="%Y-%m-%dT%H:%M:%S", unit="ms",
                     error_is_null=True)
    return ts.cast(pa.int64())


@register("millisToDate")
def _millis_to_date(batch, a):
    return pc.multiply(_col(batch, a).cast(pa.int64()), 1000) \
        .cast(pa.timestamp("us"))


@register("dateToMillis")
def _date_to_millis(batch, a):
    us = _col(batch, a).cast(pa.int64())
    return pc.divide(us, 1000)


@register("dateHourOfDay")
def _date_hour_of_day(batch, a):
    us = _col(batch, a).cast(pa.int64()).to_numpy(zero_copy_only=False)
    return pa.array(((us // 3_600_000_000) % 24).astype(np.int64))


@register("base64Encode")
def _base64_encode(batch, a):
    import base64

    c = _col(batch, a)
    return pa.array([None if v is None else
                     base64.b64encode(v if isinstance(v, bytes)
                                      else str(v).encode()).decode()
                     for v in c.to_pylist()], pa.string())


@register("base64Decode")
def _base64_decode(batch, a):
    import base64

    return pa.array([None if v is None else base64.b64decode(v)
                     for v in _col(batch, a).to_pylist()], pa.binary())


@register("murmurHash3")
def _murmur_hash3(batch, a):
    """Stable 64-bit content hash (splitmix-finalized — the role of the
    reference's murmur3 id hash; not bit-compatible with murmur)."""
    from geomesa_ray.stages.sketches import _hash_column

    return pa.array(_hash_column(_col(batch, a)).view(np.int64))


@register("uuidFromHash")
def _uuid_from_hash(batch, a):
    """Deterministic UUID-shaped id from a column's content hash (role of
    Z3UuidGenerator's content-derived feature ids)."""
    from geomesa_ray.stages.sketches import _hash_column

    h = _hash_column(_col(batch, a))
    h2 = _hash_column(pa.array([f"{int(v)}#2" for v in h], pa.string()))
    out = []
    for lo, hi in zip(h.tolist(), h2.tolist()):
        b = int(lo).to_bytes(8, "big") + int(hi).to_bytes(8, "big")
        out.append(f"{b[:4].hex()}-{b[4:6].hex()}-{b[6:8].hex()}-"
                   f"{b[8:10].hex()}-{b[10:16].hex()}")
    return pa.array(out, pa.string())


@register("stringToBytes")
def _string_to_bytes(batch, a):
    return _col(batch, a).cast(pa.binary())


@register("bytesToString")
def _bytes_to_string(batch, a):
    return _col(batch, a).cast(pa.string())


@register("coalesce")
def _coalesce(batch, a, b):
    ca = _col(batch, a)
    cb = _col(batch, b)
    if not isinstance(cb, pa.Array):
        cb = pa.array([cb] * batch.num_rows, ca.type)
    return pc.coalesce(ca, cb)


@register("dmsToDegrees")
def _dms_to_degrees(batch, a):
    """Degrees-minutes-seconds string -> decimal degrees, vectorized
    (RE2 extract): accepts 34°12'30.5"N, 34:12:30.5 S, -34 12 30.5.
    Sign comes from a leading '-' or an S/W hemisphere letter; rows that
    do not parse yield null."""
    pat = (r"(?P<sign>-?)(?P<d>\d+(?:\.\d+)?)[°:\s]\s*"
           r"(?P<m>\d+(?:\.\d+)?)['’:\s]\s*"
           r"(?P<s>\d+(?:\.\d+)?)\"?\s*(?P<h>[NSEWnsew]?)")
    st = pc.extract_regex(_col(batch, a), pattern=pat)
    valid = pc.is_valid(st).to_numpy(zero_copy_only=False)

    def f(name):
        arr = pc.struct_field(st, name).cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        return np.where(valid, np.nan_to_num(arr), 0.0)

    deg = f("d") + f("m") / 60.0 + f("s") / 3600.0
    neg_txt = pc.struct_field(st, "sign").to_pylist()
    hemi = pc.struct_field(st, "h").to_pylist()
    neg = np.array([(t == "-") or (h or "").upper() in ("S", "W")
                    for t, h in zip(neg_txt, hemi)])
    out = np.where(neg, -deg, deg)
    return pa.array(out, pa.float64(), mask=~valid)


# ---- geometry constructors (point/wkt family)

@register("point_wkt")
def _point_wkt(batch, lon, lat):
    x = _col(batch, lon).to_numpy(zero_copy_only=False)
    y = _col(batch, lat).to_numpy(zero_copy_only=False)
    return pa.array([f"POINT ({a:.10g} {b:.10g})" for a, b in zip(x, y)],
                    pa.string())


@register("geohash")
def _geohash(batch, lon, lat, precision=9):
    """Canonical base32 GeoHash of (lon, lat) — the converter DSL's
    ``geohash($lon, $lat, bits)`` analog (Convert2ViewerFunction /
    GeoHash.scala byte-compatible strings)."""
    from geomesa_ray.curve.geohash import geohash_encode

    x = _col(batch, lon).to_numpy(zero_copy_only=False)
    y = _col(batch, lat).to_numpy(zero_copy_only=False)
    return pa.array(geohash_encode(x, y, int(precision)), pa.string())


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
