"""CQL (ECQL) query-string parsing onto the engine's planner.

Reference parity: GeoMesa users express queries as (E)CQL strings parsed
by GeoTools into Filter trees that the query planner splits into a
coarse index scan + exact refinement (``QueryFilterSplitter.scala``,
``org.geotools.filter.text.ecql.ECQL`` call sites across the query
modules). This module parses the subset that maps onto the engine's
predicate surface:

- ``BBOX(geom, minx, miny, maxx, maxy)``
- ``dtg DURING <iso>/<iso>``, ``dtg AFTER <iso>``, ``dtg BEFORE <iso>``
- ``<attr> IN ('a', 'b', ...)`` and ``<attr> = 'value'``
- numeric comparisons ``<attr> < / <= / > / >= / = <number>`` and
  ``<attr> BETWEEN a AND b`` (-> ``QuerySpec.attr_range`` with
  open/closed bounds — the attribute-index strategy serves these from
  the store's secondary index when one exists)
- ``INTERSECTS(geom, <POLYGON|MULTIPOLYGON|LINESTRING WKT>)``
- ``DWITHIN(geom, POINT(x y), <dist>, meters)``
- top-level ``AND`` conjunctions of the above

The result is a :class:`CqlQuery` carrying a planner ``QuerySpec`` plus
the geometry/DWithin predicates that dispatch to the join pipelines —
``GeoMesaRayEngine.cql(expr)`` executes it end to end.

Beyond that planner-dispatched subset, :func:`parse_cql_tree` parses the
FULL boolean grammar — ``NOT``, arbitrarily nested parenthesized
``AND``/``OR`` trees, numeric comparisons (``<  <=  >  >=  =  <>``),
``BETWEEN x AND y``, and ``BEYOND(geom, POINT(x y), d, meters)`` (the
DWITHIN complement) — into a filter tree that
:func:`eval_tree` evaluates as one fused vectorized mask per batch
(the refine-side execution GeoTools ``ECQL.toFilter`` trees get in the
reference when no index applies). ``GeoMesaRayEngine.cql`` tries the
planner subset first and falls back to the tree scan.

Timestamps are ISO-8601 UTC (trailing Z optional), parsed with
``calendar.timegm`` (naive-UTC convention used throughout the engine).
"""

from __future__ import annotations

import calendar
import re
import time as _time
from dataclasses import dataclass, field

import pyarrow as pa

from geomesa_ray.planner import QuerySpec

_BBOX_RE = re.compile(
    r"^BBOX\s*\(\s*geom\s*,\s*([-\d.eE+]+)\s*,\s*([-\d.eE+]+)\s*,"
    r"\s*([-\d.eE+]+)\s*,\s*([-\d.eE+]+)\s*\)$", re.IGNORECASE)
_DURING_RE = re.compile(
    r"^dtg\s+DURING\s+(\S+)\s*/\s*(\S+)$", re.IGNORECASE)
_AFTER_RE = re.compile(r"^dtg\s+AFTER\s+(\S+)$", re.IGNORECASE)
_BEFORE_RE = re.compile(r"^dtg\s+BEFORE\s+(\S+)$", re.IGNORECASE)
_IN_RE = re.compile(r"^(\w+)\s+IN\s*\(\s*(.*)\s*\)$",
                    re.IGNORECASE | re.DOTALL)
_EQ_RE = re.compile(r"^(\w+)\s*=\s*'([^']*)'$")
_NE_STR_RE = re.compile(r"^(\w+)\s*<>\s*'([^']*)'$")
_NOTNULL_RE = re.compile(r"^(\w+)\s+IS\s+NOT\s+NULL$", re.IGNORECASE)
_ISNULL_RE = re.compile(r"^(\w+)\s+IS\s+NULL$", re.IGNORECASE)
_LIKE_RE = re.compile(r"^(\w+)\s+(I?LIKE)\s+'([^']*)'$", re.IGNORECASE)
_DISJOINT_RE = re.compile(
    r"^DISJOINT\s*\(\s*geom\s*,\s*(.+)\)$", re.IGNORECASE | re.DOTALL)
_INTERSECTS_RE = re.compile(
    r"^INTERSECTS\s*\(\s*geom\s*,\s*(.+)\)$", re.IGNORECASE | re.DOTALL)
_DWITHIN_RE = re.compile(
    r"^DWITHIN\s*\(\s*geom\s*,\s*POINT\s*\(\s*([-\d.eE+]+)\s+([-\d.eE+]+)"
    r"\s*\)\s*,\s*([-\d.eE+]+)\s*,\s*meters\s*\)$", re.IGNORECASE)
_NUM_LIT = r"[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?"
# planner comparisons: NO '<>' here — not-equal has no contiguous range
# form, so it must fall through to the tree grammar (whose own _CMP_RE
# below does match '<>')
_PCMP_RE = re.compile(
    rf"^(\w+)\s*(>=|<=|>|<|=)\s*({_NUM_LIT})$")
# _split_and breaks "x BETWEEN a AND b" at its inner AND; these two
# halves are re-merged before clause dispatch
_BETWEEN_LHS_RE = re.compile(
    rf"^(\w+)\s+BETWEEN\s+({_NUM_LIT})$", re.IGNORECASE)
_NUM_ONLY_RE = re.compile(rf"^({_NUM_LIT})$")
_BEYOND_RE = re.compile(
    r"^BEYOND\s*\(\s*geom\s*,\s*POINT\s*\(\s*([-\d.eE+]+)\s+([-\d.eE+]+)"
    r"\s*\)\s*,\s*([-\d.eE+]+)\s*,\s*meters\s*\)$", re.IGNORECASE)


@dataclass
class CqlQuery:
    """Parsed CQL: planner predicates + geometry dispatch lists (a
    conjunction may carry several INTERSECTS / DWITHIN clauses — every
    one participates)."""

    spec: QuerySpec = field(default_factory=QuerySpec)
    geometry_wkts: list = field(default_factory=list)  # INTERSECTS targets
    dwithins: list = field(default_factory=list)       # (lon, lat, dist_m)


def _parse_iso(s: str) -> int:
    s = s.rstrip("Zz")
    for fmt in ("%Y-%m-%dT%H:%M:%S", "%Y-%m-%d"):
        try:
            return calendar.timegm(_time.strptime(s, fmt))
        except ValueError:
            continue
    raise ValueError(f"unparseable CQL timestamp {s!r}")


def split_or(expr: str) -> list[str]:
    """Split on top-level OR (same parens/quote awareness as the AND
    splitter) — the engine executes each disjunct and de-duplicating
    unions the results (the reference's OR-split normalization,
    ``scan_or``'s role at the query-string level)."""
    parts, depth, start, i = [], 0, 0, 0
    in_str = False
    while i < len(expr):
        ch = expr[i]
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and expr[i:i + 4].upper() == " OR ":
            parts.append(expr[start:i])
            i += 3
            start = i + 1
        i += 1
    parts.append(expr[start:])
    return [p.strip() for p in parts if p.strip()]


def _split_and(expr: str) -> list[str]:
    """Split on top-level AND (parens- and quote-aware). The AND probe
    slices the ORIGINAL string (upper() can change string length for
    characters like 'ß', which would misalign clause boundaries)."""
    parts, depth, start, i = [], 0, 0, 0
    in_str = False
    while i < len(expr):
        ch = expr[i]
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and expr[i:i + 5].upper() == " AND ":
            parts.append(expr[start:i])
            i += 4
            start = i + 1
        i += 1
    parts.append(expr[start:])
    return [p.strip() for p in parts if p.strip()]


def _and_interval(cur: tuple | None, t0, t1) -> tuple:
    """Conjoin time clauses by INTERSECTION (t0 = max, t1 = min) — a
    later clause must never widen an earlier one."""
    c0, c1 = cur or (None, None)
    n0 = c0 if t0 is None else (t0 if c0 is None else max(c0, t0))
    n1 = c1 if t1 is None else (t1 if c1 is None else min(c1, t1))
    return (n0, n1)


def _num(s: str):
    """Numeric literal -> int when integral (exact int64 comparisons
    against integer columns), else float."""
    try:
        return int(s)
    except ValueError:
        return float(s)


def _merge_between(parts: list[str]) -> list[str]:
    """Re-join "col BETWEEN a" / "b" halves that the top-level AND
    splitter separated."""
    out, i = [], 0
    while i < len(parts):
        if (i + 1 < len(parts) and _BETWEEN_LHS_RE.match(parts[i])
                and _NUM_ONLY_RE.match(parts[i + 1])):
            out.append(f"{parts[i]} AND {parts[i + 1]}")
            i += 2
        else:
            out.append(parts[i])
            i += 1
    return out


def parse_cql(expr: str) -> CqlQuery:
    from geomesa_ray.planner import intersect_ranges

    def add_range(col: str, rng: tuple) -> None:
        cur = out.spec.attr_range.get(col)
        out.spec.attr_range[col] = rng if cur is None \
            else intersect_ranges(cur, rng)

    def add_eq(col: str, val) -> None:
        # conjoined equalities on one column: a repeat of the same value
        # is a no-op; DIFFERENT values have an empty intersection, which
        # the planner spec cannot express (attr_eq is last-wins) — raise
        # so the engine falls back to the tree grammar, whose Kleene
        # AND evaluates the contradiction to the correct empty result
        cur = out.spec.attr_eq.get(col)
        if cur is not None and cur != val:
            raise ValueError(
                f"contradictory equality on {col!r}: {cur!r} vs {val!r} "
                "(planner subset; handled by the tree grammar)")
        out.spec.attr_eq[col] = val

    out = CqlQuery()
    for clause in _merge_between(_split_and(expr.strip())):
        m = _BBOX_RE.match(clause)
        if m:
            x0, y0, x1, y1 = (float(m.group(i)) for i in range(1, 5))
            if out.spec.bbox is None:
                out.spec.bbox = (x0, x1, y0, y1)
            else:  # two BBOX clauses conjoin by intersection
                b = out.spec.bbox
                out.spec.bbox = (max(b[0], x0), min(b[1], x1),
                                 max(b[2], y0), min(b[3], y1))
            continue
        m = _DURING_RE.match(clause)
        if m:
            out.spec.interval_s = _and_interval(
                out.spec.interval_s, _parse_iso(m.group(1)),
                _parse_iso(m.group(2)))
            continue
        m = _AFTER_RE.match(clause)
        if m:
            out.spec.interval_s = _and_interval(
                out.spec.interval_s, _parse_iso(m.group(1)), None)
            continue
        m = _BEFORE_RE.match(clause)
        if m:
            out.spec.interval_s = _and_interval(
                out.spec.interval_s, None, _parse_iso(m.group(1)))
            continue
        m = _DWITHIN_RE.match(clause)
        if m:
            out.dwithins.append((float(m.group(1)), float(m.group(2)),
                                 float(m.group(3))))
            continue
        m = _INTERSECTS_RE.match(clause)
        if m:
            out.geometry_wkts.append(m.group(1).strip())
            continue
        m = _IN_RE.match(clause)
        if m:
            vals = re.findall(r"'([^']*)'", m.group(2))
            col = m.group(1)
            if col == "image_id":
                sets = out.spec.id_sets or []
                sets.append(vals)
                out.spec.id_sets = sets
                out.spec.ids = vals if out.spec.ids is None else out.spec.ids
            else:
                raise ValueError(f"IN only supported on image_id, got {col}")
            continue
        m = _EQ_RE.match(clause)
        if m:
            add_eq(m.group(1), m.group(2))
            continue
        m = _BETWEEN_RE.match(clause)
        if m:
            add_range(m.group(1), (_num(m.group(2)), _num(m.group(3)),
                                   False, False))
            continue
        m = _PCMP_RE.match(clause)
        if m:
            col, op, lit = m.group(1), m.group(2), _num(m.group(3))
            if op == "=":
                add_eq(col, lit)
            elif op == ">":
                add_range(col, (lit, None, True, False))
            elif op == ">=":
                add_range(col, (lit, None, False, False))
            elif op == "<":
                add_range(col, (None, lit, False, True))
            elif op == "<=":
                add_range(col, (None, lit, False, False))
            else:  # defensive: only the four range ops + '=' are mapped
                raise ValueError(f"unsupported comparison: {clause!r}")
            continue
        raise ValueError(f"unsupported CQL clause: {clause!r}")
    return out


# ---------------------------------------------------------------------------
# Full boolean grammar: NOT / nested parens / numeric comparisons / BETWEEN.
# Tree nodes: ("and"|"or", [children]) | ("not", child) | ("leaf", (kind, data))
# ---------------------------------------------------------------------------

_NUM = r"[-+]?[\d.]+(?:[eE][-+]?\d+)?"
_CMP_RE = re.compile(rf"^(\w+)\s*(<=|>=|<>|<|>|=)\s*({_NUM})$")
_BETWEEN_RE = re.compile(
    rf"^(\w+)\s+BETWEEN\s+({_NUM})\s+AND\s+({_NUM})$", re.IGNORECASE)
_WORD_CH = set("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789_")


def _word_at(s: str, i: int) -> str:
    """Uppercased keyword starting at ``i`` (word-boundary on both
    sides), or '' when ``i`` is mid-word / not at a word."""
    if i >= len(s) or s[i] not in _WORD_CH:
        return ""
    if i > 0 and s[i - 1] in _WORD_CH:
        return ""
    j = i
    while j < len(s) and s[j] in _WORD_CH:
        j += 1
    return s[i:j].upper()


def _skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i].isspace():
        i += 1
    return i


def _scan_leaf(s: str, i: int) -> tuple[str, int]:
    """Consume one leaf clause: stop before a top-level AND / OR or an
    unmatched ')'. A BETWEEN absorbs its own AND."""
    start = i
    depth = 0
    in_str = False
    pending_between = False
    n = len(s)
    while i < n:
        ch = s[i]
        if in_str:
            if ch == "'":
                in_str = False
            i += 1
            continue
        if ch == "'":
            in_str = True
            i += 1
            continue
        if ch == "(":
            depth += 1
            i += 1
            continue
        if ch == ")":
            if depth == 0:
                break
            depth -= 1
            i += 1
            continue
        if depth == 0:
            w = _word_at(s, i)
            if w == "BETWEEN":
                pending_between = True
                i += 7
                continue
            if w == "AND":
                if pending_between:
                    pending_between = False
                    i += 3
                    continue
                break
            if w == "OR":
                break
        i += 1
    return s[start:i].strip(), i


def _parse_tree_leaf(clause: str):
    """One leaf clause -> (kind, data). WKT geometry is pre-parsed here
    (driver-side, once) so workers evaluate against ready ring arrays."""
    m = _BBOX_RE.match(clause)
    if m:
        x0, y0, x1, y1 = (float(m.group(i)) for i in range(1, 5))
        return ("bbox", (x0, x1, y0, y1))
    m = _DURING_RE.match(clause)
    if m:
        return ("interval", (_parse_iso(m.group(1)), _parse_iso(m.group(2))))
    m = _AFTER_RE.match(clause)
    if m:
        return ("interval", (_parse_iso(m.group(1)), None))
    m = _BEFORE_RE.match(clause)
    if m:
        return ("interval", (None, _parse_iso(m.group(1))))
    m = _DWITHIN_RE.match(clause)
    if m:
        return ("dwithin", (float(m.group(1)), float(m.group(2)),
                            float(m.group(3))))
    m = _BEYOND_RE.match(clause)
    if m:
        # BEYOND is the ECQL complement of DWITHIN (strictly farther)
        return ("beyond", (float(m.group(1)), float(m.group(2)),
                           float(m.group(3))))
    m = _INTERSECTS_RE.match(clause)
    if m:
        from geomesa_ray.geom.wkt import parse_wkt_geometry

        kind, parts = parse_wkt_geometry(m.group(1).strip())
        if kind not in ("poly", "multipoly"):
            raise ValueError(
                "boolean-tree INTERSECTS supports POLYGON/MULTIPOLYGON "
                f"(a point never intersects a {kind})")
        return ("intersects", parts)
    m = _BETWEEN_RE.match(clause)
    if m:
        return ("between", (m.group(1), _num_literal(m.group(2)),
                            _num_literal(m.group(3))))
    m = _IN_RE.match(clause)
    if m:
        vals = re.findall(r"'([^']*)'", m.group(2))
        return ("isin", (m.group(1), vals))
    m = _EQ_RE.match(clause)
    if m:
        return ("eq", (m.group(1), m.group(2)))
    m = _NE_STR_RE.match(clause)
    if m:
        # string not-equal: ECQL `col <> 'v'` (UNKNOWN on null rows,
        # same as NOT col = 'v' under the Kleene eval)
        return ("ne", (m.group(1), m.group(2)))
    m = _NOTNULL_RE.match(clause)
    if m:
        return ("notnull", m.group(1))
    m = _ISNULL_RE.match(clause)
    if m:
        # IS NULL is two-valued: a null row is definitely TRUE here
        return ("isnull", m.group(1))
    m = _LIKE_RE.match(clause)
    if m:
        # SQL LIKE wildcards (% any run, _ one char); ILIKE folds case
        return ("like", (m.group(1), m.group(3),
                         m.group(2).upper() == "ILIKE"))
    m = _DISJOINT_RE.match(clause)
    if m:
        from geomesa_ray.geom.wkt import parse_wkt_geometry

        kind, parts = parse_wkt_geometry(m.group(1).strip())
        if kind not in ("poly", "multipoly"):
            raise ValueError(
                "DISJOINT supports POLYGON/MULTIPOLYGON references")
        return ("disjoint", parts)
    m = _CMP_RE.match(clause)
    if m:
        return ("cmp", (m.group(1), m.group(2), _num_literal(m.group(3))))
    raise ValueError(f"unsupported CQL clause: {clause!r}")


def _num_literal(s: str):
    """Numeric literal keeping INTEGER literals as Python ints — going
    through float() first would round anything past 2^53 (e.g. an int64
    hash literal) before the int64-exact comparison path ever sees it."""
    return int(s) if re.fullmatch(r"[-+]?\d+", s) else float(s)


def _parse_factor(s: str, i: int):
    i = _skip_ws(s, i)
    if i >= len(s):
        raise ValueError("empty CQL factor")
    if _word_at(s, i) == "NOT":
        child, i = _parse_factor(s, i + 3)
        return ("not", child), i
    if s[i] == "(":
        node, i = _parse_expr(s, i + 1)
        i = _skip_ws(s, i)
        if i >= len(s) or s[i] != ")":
            raise ValueError("unbalanced parentheses in CQL")
        return node, i + 1
    clause, i = _scan_leaf(s, i)
    if not clause:
        raise ValueError(f"unparseable CQL at offset {i}")
    return ("leaf", _parse_tree_leaf(clause)), i


def _parse_term(s: str, i: int):
    node, i = _parse_factor(s, i)
    kids = [node]
    while True:
        i = _skip_ws(s, i)
        if _word_at(s, i) == "AND":
            nxt, i = _parse_factor(s, i + 3)
            kids.append(nxt)
        else:
            break
    return (kids[0] if len(kids) == 1 else ("and", kids)), i


def _parse_expr(s: str, i: int):
    node, i = _parse_term(s, i)
    kids = [node]
    while True:
        i = _skip_ws(s, i)
        if _word_at(s, i) == "OR":
            nxt, i = _parse_term(s, i + 2)
            kids.append(nxt)
        else:
            break
    return (kids[0] if len(kids) == 1 else ("or", kids)), i


def parse_cql_tree(expr: str):
    """Full-grammar CQL parse -> boolean filter tree."""
    node, i = _parse_expr(expr, 0)
    i = _skip_ws(expr, i)
    if i != len(expr):
        raise ValueError(f"trailing CQL input at offset {i}: {expr[i:]!r}")
    return node


def tree_columns(node) -> set:
    """Attribute columns a tree's leaves reference (beyond derived
    geometry/time) — what the scan must project."""
    tag = node[0]
    if tag in ("and", "or"):
        out: set = set()
        for c in node[1]:
            out |= tree_columns(c)
        return out
    if tag == "not":
        return tree_columns(node[1])
    kind, data = node[1]
    if kind in ("eq", "ne", "isin", "between", "like"):
        return {data[0]}
    if kind == "cmp":
        return {data[0]}
    if kind in ("isnull", "notnull"):
        return {data}
    return set()


def _cmp_operands(batch, col: str, vals: tuple):
    """Column + literals prepared for a numeric comparison: returns
    (x, literals, null_mask). Integer columns compare in INT64 when
    every literal is integral and in-range — float64 only holds 53 bits,
    so casting a full-range int64 attribute (e.g. phash at 2^62 + 1)
    would silently misclassify near-boundary rows."""
    import numpy as np
    import pyarrow.compute as pc

    c = batch.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    null = np.asarray(pc.is_null(c).to_numpy(zero_copy_only=False),
                      dtype=bool)
    def _integral(v):
        return (isinstance(v, int) or float(v).is_integer())

    is_u64 = (pa.types.is_unsigned_integer(c.type)
              and c.type.bit_width == 64)
    # uint64-exact path: compare in uint64 when every literal fits
    # [0, 2^64) — astype(int64) would wrap values >= 2^63 negative,
    # and float64 would merge neighbors above 2^53.
    if is_u64 and all(_integral(v) and 0 <= v <= 2**64 - 1
                      for v in vals):
        x = c.fill_null(0).to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        return x, tuple(np.uint64(int(v)) for v in vals), null
    # int64-exact path: signed/int<64 integer columns with integral
    # in-range literals.
    if (pa.types.is_integer(c.type) and not is_u64
            and all(_integral(v)
                    and -(2**63) <= v <= 2**63 - 1 for v in vals)):
        x = c.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        return x, tuple(np.int64(int(v)) for v in vals), null
    # fallback (float columns; out-of-range literals): float64. A
    # NEGATIVE literal against a uint64 column stays sign-correct here.
    x = c.to_numpy(zero_copy_only=False).astype(np.float64)
    return x, tuple(np.float64(v) for v in vals), null


def eq_mask(batch, col: str, val) -> "np.ndarray":
    """Exact equality mask over a batch column (null rows False).

    Numeric literals compare through :func:`_cmp_operands`: Arrow's
    ``pc.equal`` safe-casts an int64 column to double for a float
    literal, which RAISES once any value exceeds 2^53 (e.g. phash) —
    and would merge neighbouring ints if it didn't. A non-integral or
    out-of-domain literal can equal no integer value, so it
    short-circuits to all-False instead of a lossy cast.
    """
    import numpy as np

    c = batch.column(col)
    ctype = c.type
    numeric_lit = isinstance(val, (int, float)) \
        and not isinstance(val, bool)
    if numeric_lit and pa.types.is_integer(ctype):
        if not (isinstance(val, int) or float(val).is_integer()):
            return np.zeros(batch.num_rows, dtype=bool)
        u64 = pa.types.is_unsigned_integer(ctype) and ctype.bit_width == 64
        lo, hi = (0, 2**64 - 1) if u64 else (-(2**63), 2**63 - 1)
        if not (lo <= val <= hi):
            return np.zeros(batch.num_rows, dtype=bool)
        x, (v,), null = _cmp_operands(batch, col, (val,))
        return (x == v) & ~null
    if numeric_lit and pa.types.is_floating(ctype):
        x, (v,), null = _cmp_operands(batch, col, (val,))
        return (x == v) & ~null
    import pyarrow.compute as pc

    return pc.fill_null(pc.equal(c, val), False) \
        .to_numpy(zero_copy_only=False).astype(bool)


def range_mask(batch, col: str, rng: tuple):
    """Exact boolean mask for an attr_range predicate over a batch —
    each bound compares through :func:`_cmp_operands` independently so
    integer columns stay int64/uint64-exact even when the OTHER bound's
    literal forces a float fallback (e.g. ``phash BETWEEN 5 AND 1e19``).
    Null attribute rows are excluded (SQL comparison semantics)."""
    import numpy as np

    from geomesa_ray.planner import normalize_range

    import pyarrow.compute as pc

    lo, hi, ls, hs = normalize_range(rng)
    c = batch.column(col)
    ctype = c.type
    if not (pa.types.is_integer(ctype) or pa.types.is_floating(ctype)):
        # string/temporal columns: Arrow's native ordering is already
        # exact — no numeric-precision hazard to work around
        m = np.ones(batch.num_rows, dtype=bool)
        if lo is not None:
            op = pc.greater if ls else pc.greater_equal
            m &= pc.fill_null(op(c, lo), False) \
                .to_numpy(zero_copy_only=False).astype(bool)
        if hi is not None:
            op = pc.less if hs else pc.less_equal
            m &= pc.fill_null(op(c, hi), False) \
                .to_numpy(zero_copy_only=False).astype(bool)
        return m
    m = np.ones(batch.num_rows, dtype=bool)
    if lo is not None:
        x, (l,), null = _cmp_operands(batch, col, (lo,))
        m &= ((x > l) if ls else (x >= l)) & ~null
    if hi is not None:
        x, (h,), null = _cmp_operands(batch, col, (hi,))
        m &= ((x < h) if hs else (x <= h)) & ~null
    return m


def eval_tree(node, batch, lon, lat, dtg_s):
    """Evaluate a filter tree to one boolean selection mask over the
    batch — vectorized per leaf, composed under SQL/Kleene THREE-VALUED
    logic: a null attribute makes its leaf UNKNOWN, unknown propagates
    through AND/OR/NOT the SQL way (``NOT unknown`` is still unknown,
    never True), and only definitely-TRUE rows are selected. So
    ``fmt <> 'png'`` and ``NOT fmt = 'png'`` agree on null rows (both
    exclude them), matching the ECQL/GeoTools filter semantics."""
    is_true, _ = _eval3(node, batch, lon, lat, dtg_s)
    return is_true


def _eval3(node, batch, lon, lat, dtg_s):
    """(is_true, is_false) masks; UNKNOWN = neither."""
    import numpy as np
    import pyarrow.compute as pc

    tag = node[0]
    if tag == "and":
        t, f = _eval3(node[1][0], batch, lon, lat, dtg_s)
        for c in node[1][1:]:
            ct, cf = _eval3(c, batch, lon, lat, dtg_s)
            t, f = t & ct, f | cf
        return t, f
    if tag == "or":
        t, f = _eval3(node[1][0], batch, lon, lat, dtg_s)
        for c in node[1][1:]:
            ct, cf = _eval3(c, batch, lon, lat, dtg_s)
            t, f = t | ct, f & cf
        return t, f
    if tag == "not":
        t, f = _eval3(node[1], batch, lon, lat, dtg_s)
        return f, t
    kind, data = node[1]
    n = batch.num_rows
    if kind == "bbox":
        x0, x1, y0, y1 = data
        m = (lon >= x0) & (lon <= x1) & (lat >= y0) & (lat <= y1)
        return m, ~m
    if kind == "interval":
        t0, t1 = data
        m = np.ones(n, dtype=bool)
        if t0 is not None:
            m &= dtg_s >= t0
        if t1 is not None:
            m &= dtg_s <= t1
        return m, ~m
    if kind in ("eq", "ne"):
        col, val = data
        eq = pc.equal(batch.column(col), val)
        t = pc.fill_null(eq, False).to_numpy(zero_copy_only=False) \
            .astype(bool)
        f = pc.fill_null(pc.invert(eq), False) \
            .to_numpy(zero_copy_only=False).astype(bool)
        return (t, f) if kind == "eq" else (f, t)
    if kind == "isin":
        col, vals = data
        hit = pc.is_in(batch.column(col),
                       value_set=pa.array(vals, pa.string()))
        null = pc.is_null(batch.column(col)) \
            .to_numpy(zero_copy_only=False).astype(bool)
        t = pc.fill_null(hit, False).to_numpy(zero_copy_only=False) \
            .astype(bool)
        return t, ~t & ~null
    if kind == "cmp":
        col, op, val = data
        x, v, null = _cmp_operands(batch, col, (val,))
        if op == "<":
            m = x < v[0]
        elif op == "<=":
            m = x <= v[0]
        elif op == ">":
            m = x > v[0]
        elif op == ">=":
            m = x >= v[0]
        elif op == "=":
            m = x == v[0]
        else:  # <> (NaN != v is True in float math, masked via `null`)
            m = x != v[0]
        return m & ~null, ~m & ~null
    if kind == "between":
        col, lo, hi = data
        x, v, null = _cmp_operands(batch, col, (lo, hi))
        m = (x >= v[0]) & (x <= v[1])
        return m & ~null, ~m & ~null
    if kind in ("isnull", "notnull"):
        isnull = pc.is_null(batch.column(data)) \
            .to_numpy(zero_copy_only=False).astype(bool)
        # two-valued: null rows are definitely TRUE/FALSE, never unknown
        return (isnull, ~isnull) if kind == "isnull" \
            else (~isnull, isnull)
    if kind == "like":
        col, pat, fold = data
        hit = pc.match_like(batch.column(col), pat, ignore_case=fold)
        t = pc.fill_null(hit, False).to_numpy(zero_copy_only=False) \
            .astype(bool)
        f = pc.fill_null(pc.invert(hit), False) \
            .to_numpy(zero_copy_only=False).astype(bool)
        return t, f
    if kind in ("intersects", "disjoint"):
        from geomesa_ray.geom.kernels import points_in_rings

        m = np.zeros(n, dtype=bool)
        for ring_set in data:
            m |= points_in_rings(lon, lat, ring_set)
        return (m, ~m) if kind == "intersects" else (~m, m)
    if kind in ("dwithin", "beyond"):
        from geomesa_ray.geom.kernels import haversine_m

        plon, plat, dist = data
        d = haversine_m(lon, lat, plon, plat)
        m = d <= dist if kind == "dwithin" else d > dist
        return m, ~m
    raise ValueError(f"unknown leaf kind {kind!r}")
