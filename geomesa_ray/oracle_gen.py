"""DuckDB oracle-SQL generation.

Every derived quantity the engine computes (lon/lat/dtg from phash, curve
coordinates, Z3/Z2 Morton codes) is also expressible as a DuckDB SQL
expression with the SAME operation order, so the driver's side-by-side
correctness gate can hash-compare Ray output against pure SQL.

Invariants relied on (verified in tests/test_oracle_parity.py):
- DuckDB BIGINT >> is arithmetic, but ``(x >> s) & mask`` equals the
  logical-shift result for the masked low bits — matching numpy int64.
- Float expressions are written with identical parenthesization on both
  sides, so IEEE doubles are bit-identical.
- Morton spreading uses only AND/OR/<< — no overflow, no sign issues
  (max interleaved value < 2^63).
"""

from __future__ import annotations

from geomesa_ray.curve.zorder import _SPLIT2, _SPLIT3
from geomesa_ray.sources.fixtures import DTG_BASE_S, DTG_SPAN_S

# ---------------------------------------------------------------- derive

LON_SQL = "((CAST((phash & 4294967295) AS DOUBLE) / 4294967296.0) * 360.0 - 180.0)"
LAT_SQL = "((CAST(((phash >> 32) & 4294967295) AS DOUBLE) / 4294967296.0) * 180.0 - 90.0)"
DTG_S_SQL = f"(((phash & 9223372036854775807) % {DTG_SPAN_S}) + {DTG_BASE_S})"


def coord_sql(val_expr: str, offset: float, extent: float, bits: int) -> str:
    """floor-scaled integer curve coordinate, clamped — mirrors
    geomesa_ray.curve.sfc.lonlat_to_xy exactly."""
    n = 1 << bits
    return (
        f"LEAST(GREATEST(CAST(FLOOR((({val_expr} + {offset:.1f}) / {extent:.1f}) "
        f"* {float(n):.1f}) AS BIGINT), 0), {n - 1})"
    )


IX_SQL = coord_sql(LON_SQL, 180.0, 360.0, 21)
IY_SQL = coord_sql(LAT_SQL, 90.0, 180.0, 21)
WEEK_SQL = f"({DTG_S_SQL} // 604800)"
IT_SQL = f"((({DTG_S_SQL} - ({WEEK_SQL} * 604800)) * 1048576) // 604800)"


def _split_ctes(chain, names, first_mask: int) -> list[str]:
    """CTE stages applying one (shift, mask) spreading step per stage to
    each named column.

    DuckDB raises on left-shift overflow (numpy wraps, harmlessly, under
    the mask), so each step uses the overflow-free algebraic identity
    ``(x | x<<s) & m  ==  (x & m) | ((x & (m>>s)) << s)``.
    """
    stages = []
    cols = ", ".join(f"({c} & {first_mask}) AS {c}" for c in names)
    stages.append(cols)
    for shift, mask in chain:
        pre = mask >> shift
        cols = ", ".join(
            f"(({c} & {mask}) | (({c} & {pre}) << {shift})) AS {c}" for c in names
        )
        stages.append(cols)
    return stages


def z3_encode_sql(images_from: str, extra_cols: str = "image_id") -> str:
    """Full SELECT producing (extra_cols..., week, z3) from an images
    relation — the SQL twin of stages.encode.derive_and_encode."""
    stages = _split_ctes(_SPLIT3, ["ix", "iy", "it"], (1 << 21) - 1)
    ctes = [
        f"b0 AS (SELECT {extra_cols}, {IX_SQL} AS ix, {IY_SQL} AS iy, "
        f"{IT_SQL} AS it, {WEEK_SQL} AS week FROM {images_from})"
    ]
    prev = "b0"
    for i, cols in enumerate(stages):
        ctes.append(f"b{i + 1} AS (SELECT {extra_cols}, week, {cols} FROM {prev})")
        prev = f"b{i + 1}"
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT {extra_cols}, week, (ix | (iy << 1) | (it << 2)) AS z3 FROM {prev}"
    )


def cell_encode_sql(images_from: str, level: int, extra_cols: str = "image_id",
                    cell_name: str = "cell") -> str:
    """SELECT producing (extra_cols..., cell) — level-L Z2 Morton cell id."""
    ix = coord_sql(LON_SQL, 180.0, 360.0, level)
    iy = coord_sql(LAT_SQL, 90.0, 180.0, level)
    stages = _split_ctes(_SPLIT2, ["ix", "iy"], (1 << 32) - 1)
    ctes = [f"c0 AS (SELECT {extra_cols}, {ix} AS ix, {iy} AS iy FROM {images_from})"]
    prev = "c0"
    for i, cols in enumerate(stages):
        ctes.append(f"c{i + 1} AS (SELECT {extra_cols}, {cols} FROM {prev})")
        prev = f"c{i + 1}"
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT {extra_cols}, (ix | (iy << 1)) AS {cell_name} FROM {prev}"
    )


def geohash_sql(images_from: str, precision: int = 9,
                extra_cols: str = "image_id",
                out_name: str = "geohash") -> str:
    """SELECT producing (extra_cols..., geohash) — the canonical base32
    GeoHash string, bit-for-bit the layout of curve/geohash.py: lon-first
    alternating bits, n_lon = ceil(5p/2), base32 alphabet indexing."""
    nbits = 5 * precision
    n_lon, n_lat = (nbits + 1) // 2, nbits // 2
    ix = coord_sql(LON_SQL, 180.0, 360.0, n_lon)
    iy = coord_sql(LAT_SQL, 90.0, 180.0, n_lat)
    stages = _split_ctes(_SPLIT2, ["ix", "iy"], (1 << 32) - 1)
    ctes = [f"g0 AS (SELECT {extra_cols}, {ix} AS ix, {iy} AS iy "
            f"FROM {images_from})"]
    prev = "g0"
    for i, cols in enumerate(stages):
        ctes.append(f"g{i + 1} AS (SELECT {extra_cols}, {cols} FROM {prev})")
        prev = f"g{i + 1}"
    code = "(ix | (iy << 1))" if nbits % 2 else "((ix << 1) | iy)"
    ctes.append(f"gc AS (SELECT {extra_cols}, {code} AS code FROM {prev})")
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    chars = " || ".join(
        f"substr('{alpha}', CAST(((code >> {5 * (precision - 1 - c)}) & 31) "
        f"AS INT) + 1, 1)" for c in range(precision))
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT {extra_cols}, ({chars}) AS {out_name} FROM gc")


def z2_from_xy_sql(from_rel: str, extra_cols: str,
                   cell_name: str = "tile") -> str:
    """Morton-encode integer ix/iy columns of an existing relation
    (same overflow-free spreading stages as cell_encode_sql)."""
    stages = _split_ctes(_SPLIT2, ["ix", "iy"], (1 << 32) - 1)
    ctes = [f"m0 AS (SELECT {extra_cols}, ix, iy FROM {from_rel})"]
    prev = "m0"
    for i, cols in enumerate(stages):
        ctes.append(f"m{i + 1} AS (SELECT {extra_cols}, {cols} FROM {prev})")
        prev = f"m{i + 1}"
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT {extra_cols}, (ix | (iy << 1)) AS {cell_name} FROM {prev}"
    )


RAD_CONST = "0.017453292519943295"  # double nearest to pi/180 (np.radians)


def haversine_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """Haversine meters with the EXACT operation order of
    geom.kernels.haversine_m (incl. the [0,1] clip before asin), so the
    same libm on the same box produces bit-identical doubles."""
    r1lon, r1lat = f"({lon1} * {RAD_CONST})", f"({lat1} * {RAD_CONST})"
    r2lon, r2lat = f"({lon2} * {RAD_CONST})", f"({lat2} * {RAD_CONST})"
    sdlat = f"sin(({r2lat} - {r1lat}) / 2.0)"
    sdlon = f"sin(({r2lon} - {r1lon}) / 2.0)"
    a = (f"(({sdlat} * {sdlat}) + ((cos({r1lat}) * cos({r2lat})) "
         f"* ({sdlon} * {sdlon})))")
    return (f"(2.0 * 6371000.0 * asin(sqrt(LEAST(GREATEST({a}, 0.0), "
            f"1.0))))")


def images_rel(fixture_dir: str) -> str:
    # glob: matches both the single-file layout (oracle scales) and the
    # images_NNNN.parquet shards written at bench scales
    return f"read_parquet('{fixture_dir}/images*.parquet')"


def regions_rel(fixture_dir: str) -> str:
    return f"read_parquet('{fixture_dir}/regions.parquet')"


def probes_rel(fixture_dir: str) -> str:
    return f"read_parquet('{fixture_dir}/probes.parquet')"
