"""Per-feature visibility labels + authorizations — the data-level analog
of the reference's security model.

Reference parity: GeoMesa attaches an Accumulo column-visibility
expression to every feature at write time
(``geomesa-accumulo/.../data/AccumuloFeatureWriter.scala:63-96`` reads the
``geomesa.feature.visibility`` hint) and every query passes the user's
authorizations (``geomesa-security/.../AuthorizationsProvider.scala``);
the tablet server only returns cells whose expression is satisfied by the
auth set. Here the visibility expression is a plain STRING COLUMN on the
stored rows and the filter is a vectorized batch mask — the same
semantics without a tablet server: a row is visible iff its expression
evaluates true under the reader's auth set; an empty/null expression is
visible to everyone (Accumulo's empty-visibility rule).

Expression grammar (the Accumulo ColumnVisibility subset in practical
use): labels (alnum ``_ - : .``), ``&`` (and), ``|`` (or), parentheses.
Accumulo forbids mixing ``&`` and ``|`` at one nesting level without
parens — enforced here too, so expressions written for the reference
parse identically.

Scale shape: visibility expressions repeat massively across rows (a
corpus has a handful of label policies), so the mask evaluator
dictionary-encodes the column and evaluates each DISTINCT expression
once per batch, then projects the per-expression verdicts back — O(rows)
with a tiny constant, no per-row parsing.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_LABEL_RE = re.compile(r"[A-Za-z0-9_\-:.]+")


def parse_visibility(expr: str):
    """Parse a column-visibility expression into a tree:
    ("label", name) | ("and"|"or", [children]). Raises ValueError on
    malformed input (unbalanced parens, mixed operators without parens,
    empty terms)."""
    s = expr.strip()
    node, i = _parse_vis(s, 0)
    if i != len(s):
        raise ValueError(f"trailing input in visibility {expr!r}")
    return node


def _parse_vis(s: str, i: int):
    kids = []
    op = None
    n = len(s)
    while True:
        if i >= n:
            raise ValueError(f"empty visibility term in {s!r}")
        if s[i] == "(":
            node, i = _parse_vis(s, i + 1)
            if i >= n or s[i] != ")":
                raise ValueError(f"unbalanced parens in {s!r}")
            i += 1
        else:
            m = _LABEL_RE.match(s, i)
            if not m:
                raise ValueError(f"expected label at offset {i} in {s!r}")
            node = ("label", m.group(0))
            i = m.end()
        kids.append(node)
        if i >= n or s[i] == ")":
            break
        if s[i] not in "&|":
            raise ValueError(f"unexpected {s[i]!r} at offset {i} in {s!r}")
        this_op = "and" if s[i] == "&" else "or"
        if op is not None and this_op != op:
            raise ValueError(
                f"mixed & and | without parentheses in {s!r} (Accumulo "
                "ColumnVisibility requires explicit grouping)")
        op = this_op
        i += 1
    if len(kids) == 1:
        return kids[0], i
    return (op, kids), i


def evaluate_visibility(expr: str, auths: set[str]) -> bool:
    """True iff ``expr`` is satisfied by the auth set (empty expr =
    public)."""
    if expr is None or expr == "":
        return True
    return _eval_vis(parse_visibility(expr), auths)


def _eval_vis(node, auths: set[str]) -> bool:
    tag = node[0]
    if tag == "label":
        return node[1] in auths
    if tag == "and":
        return all(_eval_vis(c, auths) for c in node[1])
    return any(_eval_vis(c, auths) for c in node[1])


def _safe_visibility(expr: str, auths: set[str]) -> bool:
    """A malformed visibility label hides its row instead of wedging the
    whole read task — Accumulo treats an unsatisfiable/unparseable
    visibility as not visible to the reader."""
    try:
        return evaluate_visibility(expr, auths)
    except ValueError:
        return False


def visibility_mask(col, auths) -> np.ndarray:
    """Boolean row mask for a visibility-expression string column under
    an auth set — each DISTINCT expression parsed/evaluated once; a
    malformed expression marks its rows invisible (never raises)."""
    auths = set(auths)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = pc.dictionary_encode(col)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    dic = enc.dictionary.to_pylist()
    verdicts = np.array([_safe_visibility(v, auths) for v in dic],
                        dtype=bool)
    idx = enc.indices.to_numpy(zero_copy_only=False)
    out = np.empty(len(col), dtype=bool)
    null = np.asarray(pc.is_null(enc.indices).to_numpy(zero_copy_only=False),
                      dtype=bool)
    out[null] = True  # null visibility = public
    valid = ~null
    out[valid] = verdicts[idx[valid].astype(np.int64)]
    return out


def apply_visibility(ds: ray.data.Dataset, auths,
                     col: str = "vis") -> ray.data.Dataset:
    """Filter a dataset to the rows visible under ``auths`` — the
    AuthorizationsProvider read-path hook, applied as a vectorized
    map_batches stage (runs BEFORE any further projection so secured
    rows never reach later stages)."""
    auths = sorted(set(auths))

    def fn(batch: pa.Table) -> pa.Table:
        if col not in batch.column_names:
            return batch  # unsecured table: everything visible
        m = visibility_mask(batch.column(col), set(auths))
        return batch.filter(pa.array(m))

    return ds.map_batches(fn, batch_format="pyarrow")
