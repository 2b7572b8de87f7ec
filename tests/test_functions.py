"""Converter-DSL function registry: scalar + collection (List/Map) fns.

Reference parity: Transformers.scala:363-586 scalar function library;
SimpleFeatureTypes.scala:206-213 List[T]/Map[K,V] attribute types.
"""

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.functions.registry import FUNCTIONS, transform_batch


def T(**cols):
    return pa.table({k: pa.array(v) for k, v in cols.items()})


class TestScalarFns:
    def test_string_family(self):
        t = T(s=[" Ab ", "cd", ""])
        out = transform_batch(t, {
            "trimmed": ("trim", "col:s"),
            "up": ("uppercase", "col:s"),
            "idx": ("indexOf", "col:s", "d"),
            "rep": ("replace", "col:s", "d", "x"),
            "pad": ("padLeft", "col:s", 6, "_"),
        })
        assert out.column("trimmed").to_pylist() == ["Ab", "cd", ""]
        assert out.column("idx").to_pylist() == [-1, 1, -1]
        assert out.column("rep").to_pylist() == [" Ab ", "cx", ""]
        assert out.column("pad").to_pylist() == ["__ Ab ", "____cd", "______"]

    def test_numeric_family(self):
        t = T(a=[10, -3, 7], b=[3, 2, 7])
        out = transform_batch(t, {
            "sub": ("subtract", "col:a", "col:b"),
            "div": ("divide", "col:a", "col:b"),
            "m": ("mod", "col:a", 3),
            "ab": ("abs", "col:a"),
            "mn": ("min", "col:a", "col:b"),
            "mx": ("max", "col:a", "col:b"),
        })
        assert out.column("sub").to_pylist() == [7, -5, 0]
        assert out.column("m").to_pylist() == [1, 0, 1]
        assert out.column("mn").to_pylist() == [3, -3, 7]

    def test_empty_to_null_and_boolean(self):
        t = T(s=["", "x", "true"], b=["true", "False", "TRUE"])
        out = transform_batch(t, {
            "n": ("emptyToNull", "col:s"),
            "bb": ("toBoolean", "col:b"),
        })
        assert out.column("n").to_pylist() == [None, "x", "true"]
        assert out.column("bb").to_pylist() == [True, False, True]

    def test_regex_extract_matches_re2(self):
        t = T(s=['{"k": 87}', '{"k": 5}', "nope"])
        out = transform_batch(t, {"v": ("regexExtract", "col:s", r"(\d+)")})
        assert out.column("v").to_pylist() == ["87", "5", None]


class TestCollectionFns:
    def test_parse_list_int(self):
        t = T(s=["1,2,3", "9", ""])
        out = transform_batch(t, {"l": ("parseList", "col:s", ",", "int")})
        assert out.column("l").to_pylist() == [[1, 2, 3], [9], None]
        sizes = transform_batch(out, {"n": ("listSize", "col:l"),
                                      "first": ("listItem", "col:l", 0)})
        assert sizes.column("n").to_pylist() == [3, 1, None]
        assert sizes.column("first").to_pylist() == [1, 9, None]

    def test_parse_map_kv(self):
        t = T(s=["a->1,b->2", "c->3"])
        out = transform_batch(t, {"m": ("parseMap", "col:s")})
        assert out.column("m").to_pylist() == [
            [("a", 1), ("b", 2)], [("c", 3)]]
        v = transform_batch(out, {"a": ("mapValue", "col:m", "a"),
                                  "b": ("mapValue", "col:m", "b")})
        assert v.column("a").to_pylist() == [1, None]
        assert v.column("b").to_pylist() == [2, None]

    def test_json_map_multi_key(self):
        t = T(s=['{"k": 87, "z": 5}', "{}", '{"z": 1}'])
        out = transform_batch(t, {"m": ("jsonMap", "col:s")})
        assert out.column("m").to_pylist() == [
            [("k", 87), ("z", 5)], [], [("z", 1)]]
        v = transform_batch(out, {"z": ("mapValue", "col:m", "z")})
        assert v.column("z").to_pylist() == [5, None, 1]

    def test_map_typed_column_is_arrow_map(self):
        t = T(s=["a->1"])
        m = FUNCTIONS["parseMap"](t, "col:s")
        assert pa.types.is_map(m.type)
        assert pa.types.is_int64(m.type.item_type)

    def test_json_map_malformed_rows_null_out(self):
        """Converter convention: a malformed JSON or non-castable value
        nulls that ROW, never aborts the batch (ADVICE r02)."""
        t = T(s=['{"k": 1}', "not json", '{"k": "xyz"}', "[1,2]",
                 '{"k": 2}'])
        out = transform_batch(t, {"m": ("jsonMap", "col:s")})
        assert out.column("m").to_pylist() == [
            [("k", 1)], None, None, None, [("k", 2)]]

    def test_json_map_null_value_is_null_entry(self):
        # a JSON null VALUE is a null map entry, not a row failure —
        # the row's other entries survive
        t = T(s=['{"a": 1, "b": null}'])
        out = transform_batch(t, {"m": ("jsonMap", "col:s")})
        assert out.column("m").to_pylist() == [[("a", 1), ("b", None)]]
        s = transform_batch(t, {"m": ("jsonMap", "col:s", "string")})
        assert s.column("m").to_pylist() == [[("a", "1"), ("b", None)]]

    def test_map_value_on_sliced_map_array(self):
        """mapValue must be offset-correct on a SLICED MapArray (ADVICE
        r02: full child arrays + unrebased offsets gave wrong values)."""
        from geomesa_ray.functions.registry import FUNCTIONS as F

        t = T(s=["a->1,b->2", "a->3", "a->4,c->5", "b->6"])
        m = F["parseMap"](t, "col:s")
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        sliced = pa.table({"m": m.slice(1, 2)})
        got = F["mapValue"](sliced, "col:m", "a")
        assert got.to_pylist() == [3, 4]
        got_b = F["mapValue"](sliced, "col:m", "b")
        assert got_b.to_pylist() == [None, None]


class TestRegistryExtension:
    def test_user_registered_fn(self):
        from geomesa_ray.functions.registry import register

        @register("x_double_len")
        def _dl(batch, a):
            import pyarrow.compute as pc

            col = batch.column(a[4:]) if a.startswith("col:") else a
            return pc.multiply(pc.utf8_length(col).cast(pa.int64()), 2)

        t = T(s=["ab", "xyz"])
        out = transform_batch(t, {"v": ("x_double_len", "col:s")})
        assert out.column("v").to_pylist() == [4, 6]


class TestDateHashFns:
    def test_date_family(self):
        t = T(iso=["2024-01-05T10:30:00", "2024-02-01T00:00:00"])
        out = transform_batch(t, {"ms": ("isoDateToMillis", "col:iso")})
        ms = out.column("ms").to_pylist()
        assert ms[0] == 1704450600000
        back = transform_batch(out, {"d": ("millisToDate", "col:ms")})
        assert str(back.column("d")[0].as_py()) == "2024-01-05 10:30:00"
        hrs = transform_batch(back, {"h": ("dateHourOfDay", "col:d"),
                                     "m2": ("dateToMillis", "col:d")})
        assert hrs.column("h").to_pylist() == [10, 0]
        assert hrs.column("m2").to_pylist() == ms

    def test_base64_roundtrip(self):
        t = T(s=["hello", "x"])
        enc = transform_batch(t, {"b": ("base64Encode", "col:s")})
        assert enc.column("b").to_pylist() == ["aGVsbG8=", "eA=="]
        dec = transform_batch(enc, {"r": ("base64Decode", "col:b")})
        assert dec.column("r").to_pylist() == [b"hello", b"x"]

    def test_hash_and_uuid_stable(self):
        t = T(s=["doc-a", "doc-b", "doc-a"])
        out = transform_batch(t, {"h": ("murmurHash3", "col:s"),
                                  "u": ("uuidFromHash", "col:s")})
        h = out.column("h").to_pylist()
        u = out.column("u").to_pylist()
        assert h[0] == h[2] != h[1]
        assert u[0] == u[2] != u[1]
        import re

        assert re.fullmatch(
            r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}",
            u[0])

    def test_coalesce(self):
        t = T(a=pa.array([None, "x", None], pa.string()),
              b=pa.array(["d1", "d2", "d3"], pa.string()))
        out = transform_batch(t, {"c": ("coalesce", "col:a", "col:b")})
        assert out.column("c").to_pylist() == ["d1", "x", "d3"]


class TestReviewRegressions2:
    def test_regex_extract_escaped_paren(self):
        t = T(s=["(42)", "(7)", "x"])
        out = transform_batch(t, {"v": ("regexExtract", "col:s",
                                        r"\((\d+)\)")})
        assert out.column("v").to_pylist() == ["42", "7", None]

    def test_parse_map_null_vs_empty(self):
        t = T(s=pa.array(["a->1", "", None], pa.string()))
        out = transform_batch(t, {"m": ("parseMap", "col:s")})
        assert out.column("m").to_pylist() == [[("a", 1)], None, None]

    def test_json_map_null_vs_empty_object(self):
        t = T(s=pa.array(['{"k": 1}', "{}", None, ""], pa.string()))
        out = transform_batch(t, {"m": ("jsonMap", "col:s")})
        assert out.column("m").to_pylist() == [[("k", 1)], [], None, None]
        v = transform_batch(out, {"k": ("mapValue", "col:m", "k")})
        assert v.column("k").to_pylist() == [1, None, None, None]

    def test_simhash_uses_full_64_bits(self):
        from geomesa_ray.stages.dedup import _simhash_batch

        sims = _simhash_batch(pa.array(
            [f"w{i} x{i * 7} y{i * 13} z{i * 29}" for i in range(64)],
            pa.string()))
        # bit 63 must carry signal: over many docs some simhashes are
        # negative (top bit set) — a 63-bit degradation would zero it
        assert (sims < 0).any()
