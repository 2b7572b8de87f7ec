"""Mergeable sketches: HyperLogLog approximate distinct count.

The reference era has no sketches (cardinality is a user-declared hint,
``AttributeIdxStrategy.getCost``); large-scale training-data pipelines
need them, and they are the canonical Ray-Data aggregation shape: one
serialized sketch per batch (a few KB regardless of input size), merged
register-wise in a tiny second stage — the sketch IS the combiner.

Standard HLL (Flajolet et al.): p-bit register index, rank of the
remaining hash bits, harmonic-mean estimator with small/large-range
corrections. Deterministic (splitmix64 hashing), ~1.04/sqrt(2^p)
relative error.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from geomesa_ray.sources.fixtures import splitmix64
from geomesa_ray.util import gather_combine


_POLY_P = np.uint64(1099511628211)  # FNV-1a prime (odd, full-period mod 2^64)


def _hash_string_array(col: pa.Array) -> np.ndarray:
    """Vectorized 64-bit digests of a string column: segmented polynomial
    hash straight over the Arrow UTF-8 data buffer (byte * P^position,
    summed per string via a cumsum difference), splitmix-finalized. No
    per-row Python — the only loop is O(max string length) building the
    power table. Strings need the full 64-bit space: a crc32 pre-hash
    would cap distincts at 2^32 and saturate the estimator at scale."""
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    n = len(col)
    offs = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset:col.offset + n + 1].astype(np.int64)
    lens = offs[1:] - offs[:-1]
    len_mix = splitmix64(lens.astype(np.uint64) ^ np.uint64(0xA5A5A5A5))
    if int(lens.sum()) == 0:
        return splitmix64(len_mix)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    d = data[offs[0]:offs[-1]].astype(np.uint64)
    starts_rel = offs[:-1] - offs[0]
    pos = np.arange(len(d), dtype=np.int64) - np.repeat(starts_rel, lens)
    e = np.repeat(lens, lens) - 1 - pos  # exponent: high byte first
    maxlen = int(lens.max())
    pows = np.empty(maxlen, dtype=np.uint64)
    pows[0] = 1
    with np.errstate(over="ignore"):
        for i in range(1, maxlen):
            pows[i] = pows[i - 1] * _POLY_P
        terms = d * pows[e]
    csum = np.concatenate([np.zeros(1, np.uint64),
                           np.cumsum(terms, dtype=np.uint64)])
    tot = csum[offs[1:] - offs[0]] - csum[starts_rel]
    return splitmix64(tot ^ len_mix)


def _hash_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return splitmix64(col.to_numpy(zero_copy_only=False)
                          .astype(np.int64).view(np.uint64))
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return _hash_string_array(col)
    # fallback for exotic types: per-row repr digest (not a hot path)
    import zlib

    h = np.array(
        [zlib.crc32(b) | (zlib.crc32(b + b"#") << 32)
         for b in (str(v).encode() for v in col.to_pylist())],
        dtype=np.uint64)
    return splitmix64(h)


def hll_registers(h: np.ndarray, p: int) -> np.ndarray:
    """uint64 hashes -> max-rank registers (length 2^p, uint8)."""
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # rank = leading zeros of `rest` + 1 (sentinel bit bounds it)
    # rank = leading zeros + 1 = 64 - floor(log2(v)); the sentinel bit
    # guarantees v > 0. Clip guards the float-rounding edge where a value
    # near 2^64 rounds up and log2 returns exactly 64.
    v = rest.astype(np.float64)
    rank = np.clip(64 - np.floor(np.log2(v)), 1, 64).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return float(est)


def approx_distinct(sf_dir_table_col, table: str | None = None,
                    col: str | None = None, p: int = 12,
                    fanin: int = 8) -> ray.data.Dataset:
    """(approx_distinct,) — one row. Per-batch sketches max-merge
    through a ``fanin``-block fan-in level, then one tiny combine."""
    from geomesa_ray.sources.io import read_table

    sf_dir = sf_dir_table_col

    def partial(batch: pa.Table) -> pa.Table:
        h = _hash_column(batch.column(col))
        regs = hll_registers(h, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    def merge_regs(batch: pa.Table) -> pa.Table:
        merged = np.zeros(1 << p, dtype=np.uint8)
        for b in batch.column("regs").to_pylist():
            merged = np.maximum(merged, np.frombuffer(b, dtype=np.uint8))
        return pa.table({"regs": pa.array([merged.tobytes()], pa.binary())})

    def final(batch: pa.Table) -> pa.Table:
        merged = np.zeros(1 << p, dtype=np.uint8)
        for b in batch.column("regs").to_pylist():
            merged = np.maximum(merged, np.frombuffer(b, dtype=np.uint8))
        return pa.table({"approx_distinct": pa.array(
            [int(round(hll_estimate(merged)))], pa.int64())})

    ds = read_table(sf_dir, table, columns=[col])
    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    # fan-in level BEFORE the single combine: coalesce partial sketches
    # into `fanin` blocks (split/coalesce, no all-to-all) and max-merge
    # each block to ONE row, so the final task sees <= fanin sketches
    # instead of one per input batch (at 100 TB that is millions of
    # 2^p-byte rows — unbounded for a single task without this level)
    level = parts.repartition(fanin).map_batches(
        merge_regs, batch_format="pyarrow", batch_size=None)
    return gather_combine(level, final)


# ---------------------------------------------------------------------------
# Heavy hitters: exact distributed top-k and a mergeable Misra-Gries
# (space-saving) summary. At 100 TB the exact path's shuffle volume is
# one row per distinct value per block (already pre-aggregated); the
# sketch path caps every partial at m counters regardless of
# cardinality — the mergeable-summaries shape (Agarwal et al., PODS'12).
# ---------------------------------------------------------------------------


def _value_part(t: pa.Table, col: str, n_parts: int) -> pa.Table:
    """Merge-bucket key for pre-aggregated (value, cnt) partials: a
    value's every partial count lands in ONE bucket (part = splitmix
    of the value hash mod n_parts), so a per-bucket sum is that
    value's EXACT total. Null values (a possible group, and the MG
    error rows) route to bucket 0 so they too co-locate."""
    import pyarrow.compute as pc

    c = t.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    isnull = pc.is_null(c).to_numpy(zero_copy_only=False).astype(bool)
    if pa.types.is_integer(c.type):
        c = c.fill_null(0)
    elif pa.types.is_string(c.type) or pa.types.is_large_string(c.type):
        c = c.fill_null("")
    h = _hash_column(c)
    part = (h % np.uint64(n_parts)).astype(np.int64)
    part[isnull] = 0
    return t.append_column("part", pa.array(part))


def _exact_topk(parts: ray.data.Dataset, col: str, k: int,
                n_parts: int) -> ray.data.Dataset:
    """Shared merge topology for the exact heavy-hitter ops: bucket the
    (value, cnt) partials by value hash, sum + local top-k per bucket
    (exact — a value's full count is inside its bucket, and the global
    comparator restricted to a bucket preserves order, so the global
    top-k is a subset of the per-bucket top-k union), then one final
    merge over <= n_parts * k rows. No task ever holds the vocabulary."""

    def bucket_topk(group: pa.Table) -> pa.Table:
        out = group.drop_columns(["part"]).group_by([col]).aggregate(
            [("cnt", "sum")])
        out = out.select([col, "cnt_sum"]).rename_columns([col, "cnt"])
        order = [("cnt", "descending"), (col, "ascending")]
        return out.sort_by(order).slice(0, k)

    def final(batch: pa.Table) -> pa.Table:
        order = [("cnt", "descending"), (col, "ascending")]
        return batch.sort_by(order).slice(0, k)

    keyed = parts.map_batches(lambda t: _value_part(t, col, n_parts),
                              batch_format="pyarrow")
    buckets = keyed.groupby("part").map_groups(bucket_topk,
                                               batch_format="pyarrow")
    return gather_combine(buckets, final)


def topk_values(sf_dir: str, table: str, col: str, k: int = 20,
                n_parts: int = 64) -> ray.data.Dataset:
    """EXACT top-k values of a column by count: per-batch vectorized
    group-counts (one row per distinct per block leaves the node), a
    value-bucketed distributed merge, deterministic order (cnt desc,
    value asc)."""
    from geomesa_ray.sources.io import read_table

    def partial(batch: pa.Table) -> pa.Table:
        out = batch.select([col]).group_by([col]).aggregate(
            [([], "count_all")])
        out = out.select([col, "count_all"]).rename_columns([col, "cnt"])
        return out.set_column(
            out.schema.get_field_index("cnt"), "cnt",
            out.column("cnt").cast(pa.int64()))

    ds = read_table(sf_dir, table, columns=[col])
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
    return _exact_topk(parts, col, k, n_parts)


def topk_words(sf_dir: str, k: int = 20,
               table: str = "documents",
               col: str = "text", n_parts: int = 64) -> ray.data.Dataset:
    """EXACT top-k whitespace tokens over a text column (token heavy
    hitters — the LLM-corpus staple). Tokenization is a single Arrow
    split_pattern + flatten per batch (empty tokens from runs of
    spaces are dropped), then the same partial/merge as topk_values."""
    import pyarrow.compute as pc

    from geomesa_ray.sources.io import read_table

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(batch.column(col), " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        t = pa.table({"word": toks})
        out = t.group_by(["word"]).aggregate([([], "count_all")])
        out = out.select(["word", "count_all"]) \
            .rename_columns(["word", "cnt"])
        return out.set_column(
            out.schema.get_field_index("cnt"), "cnt",
            out.column("cnt").cast(pa.int64()))

    ds = read_table(sf_dir, table, columns=[col])
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
    return _exact_topk(parts, "word", k, n_parts)


def _mg_truncate(t: pa.Table, col: str, m: int):
    """Misra-Gries reduction of exact (value, cnt) rows to <= m
    counters: subtract the (m+1)-th largest count from every counter
    and keep the positive ones. Returns (table, subtracted) — the
    subtraction is this step's error contribution."""
    cnts = t.column("cnt").to_numpy(zero_copy_only=False)
    if len(cnts) <= m:
        return t, 0
    thr = int(np.partition(cnts, -(m + 1))[-(m + 1)])
    keep = cnts > thr
    out = t.filter(pa.array(keep))
    new_cnts = out.column("cnt").to_numpy(zero_copy_only=False) - thr
    out = out.set_column(out.schema.get_field_index("cnt"), "cnt",
                         pa.array(new_cnts, pa.int64()))
    return out, thr


def topk_sketch(sf_dir: str, table: str, col: str, k: int = 20,
                m: int = 1024, fanin: int = 8) -> pa.Table:
    """APPROXIMATE top-k via mergeable Misra-Gries summaries: each
    batch reduces its exact counts to <= m counters (a null-value row
    carries the summary's error mass); the merge sums counters,
    re-truncates, and reports per-value bounds

        est <= true_count <= est + err  (err = total subtracted mass).

    Any value with true count > N * (sum of per-summary thresholds)/N
    survives; with m >> k and skewed data the top-k set equals the
    exact one. Driver holds only the k result rows.

    Merge topology: summaries are MERGEABLE (Agarwal et al.), so a
    shuffle-free fan-in level (coalesce to ``fanin`` blocks, merge
    each block to one <= m+1-row summary) bounds the final task at
    fanin * (m+1) rows — no task holds one summary per input batch."""
    from geomesa_ray.sources.io import read_table

    def _with_err(t: pa.Table, err: int) -> pa.Table:
        """Append the error-mass row, tagged by an EXPLICIT is_err
        column — a genuine null column value is a real counter (the
        exact topk_values reports a null group too) and must not be
        conflated with error mass."""
        t = t.append_column(
            "is_err", pa.array(np.zeros(t.num_rows, dtype=bool)))
        if err:
            t = pa.concat_tables([t, pa.table(
                {col: pa.array([None], t.schema.field(col).type),
                 "cnt": pa.array([err], pa.int64()),
                 "is_err": pa.array([True])})])
        return t

    def partial(batch: pa.Table) -> pa.Table:
        out = batch.select([col]).group_by([col]).aggregate(
            [([], "count_all")])
        out = out.select([col, "count_all"]).rename_columns([col, "cnt"])
        out = out.set_column(
            out.schema.get_field_index("cnt"), "cnt",
            out.column("cnt").cast(pa.int64()))
        out, err = _mg_truncate(out, col, m)
        return _with_err(out, err)

    def _merge_summaries(batch: pa.Table):
        """Sum counters per value, truncate to m; returns (table of
        <= m survivors, error mass = incoming err rows + threshold)."""
        errm = batch.column("is_err").to_numpy(zero_copy_only=False) \
            .astype(bool)
        cnts = batch.column("cnt").to_numpy(zero_copy_only=False)
        err = int(cnts[errm].sum())
        t = batch.filter(pa.array(~errm)).group_by([col]).aggregate(
            [("cnt", "sum")])
        t = t.select([col, "cnt_sum"]).rename_columns([col, "cnt"])
        t, thr = _mg_truncate(t, col, m)
        return t, err + thr

    def level(batch: pa.Table) -> pa.Table:
        t, err = _merge_summaries(batch)
        return _with_err(t, err)

    def final(batch: pa.Table) -> pa.Table:
        t, err = _merge_summaries(batch)
        order = [("cnt", "descending"), (col, "ascending")]
        t = t.sort_by(order).slice(0, k)
        est = t.column("cnt").to_numpy(zero_copy_only=False)
        return pa.table({col: t.column(col),
                         "est": pa.array(est, pa.int64()),
                         "est_hi": pa.array(est + err, pa.int64())})

    ds = read_table(sf_dir, table, columns=[col])
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
    mid = parts.repartition(fanin).map_batches(
        level, batch_format="pyarrow", batch_size=None)
    return gather_combine(mid, final)


def descriptive_stats(sf_dir: str, table: str,
                      cols: list[str]) -> ray.data.Dataset:
    """Mergeable per-column descriptive statistics (count, mean,
    population variance, min, max) in one streaming pass.

    Each batch reduces to a moments row (n, sum, sum of squared
    deviations, min, max) per column; partials merge with Chan's
    parallel update

        M2 = M2_a + M2_b + delta^2 * n_a*n_b/(n_a+n_b)

    so the result is exact up to float addition order — the variance
    never suffers the catastrophic cancellation of the naive
    sum(x^2) - n*mean^2 form. Nulls are excluded per column. One small
    combine at the end; the driver holds len(cols) rows.
    """
    from geomesa_ray.sources.io import read_table

    def partial(batch: pa.Table) -> pa.Table:
        rows = {"col": [], "n": [], "mean": [], "m2": [],
                "vmin": [], "vmax": []}
        for c in cols:
            x = batch.column(c).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            x = x[~np.isnan(x)]
            n = len(x)
            mean = float(x.mean()) if n else 0.0
            rows["col"].append(c)
            rows["n"].append(n)
            rows["mean"].append(mean)
            rows["m2"].append(float(((x - mean) ** 2).sum()) if n else 0.0)
            rows["vmin"].append(float(x.min()) if n else np.inf)
            rows["vmax"].append(float(x.max()) if n else -np.inf)
        return pa.table({"col": pa.array(rows["col"], pa.string()),
                         "n": pa.array(rows["n"], pa.int64()),
                         "mean": pa.array(rows["mean"]),
                         "m2": pa.array(rows["m2"]),
                         "vmin": pa.array(rows["vmin"]),
                         "vmax": pa.array(rows["vmax"])})

    def final(batch: pa.Table) -> pa.Table:
        out = {"col": [], "n": [], "mean": [], "variance": [],
               "min": [], "max": []}
        cn = np.asarray(batch.column("col").to_pylist(), dtype=object)
        ns = batch.column("n").to_numpy(zero_copy_only=False)
        means = batch.column("mean").to_numpy(zero_copy_only=False)
        m2s = batch.column("m2").to_numpy(zero_copy_only=False)
        vmins = batch.column("vmin").to_numpy(zero_copy_only=False)
        vmaxs = batch.column("vmax").to_numpy(zero_copy_only=False)
        for c in cols:
            idx = np.nonzero((cn == c) & (ns > 0))[0]
            n_t, mean_t, m2_t = 0, 0.0, 0.0
            for i in idx:
                nb = int(ns[i])
                if n_t == 0:
                    n_t, mean_t, m2_t = nb, means[i], m2s[i]
                else:
                    delta = means[i] - mean_t
                    tot = n_t + nb
                    m2_t += m2s[i] + delta * delta * n_t * nb / tot
                    mean_t += delta * nb / tot
                    n_t = tot
            out["col"].append(c)
            out["n"].append(n_t)
            out["mean"].append(mean_t if n_t else None)
            out["variance"].append(m2_t / n_t if n_t else None)
            out["min"].append(float(vmins[idx].min()) if n_t else None)
            out["max"].append(float(vmaxs[idx].max()) if n_t else None)
        return pa.table({"col": pa.array(out["col"], pa.string()),
                         "n": pa.array(out["n"], pa.int64()),
                         "mean": pa.array(out["mean"], pa.float64()),
                         "variance": pa.array(out["variance"], pa.float64()),
                         "min": pa.array(out["min"], pa.float64()),
                         "max": pa.array(out["max"], pa.float64())})

    ds = read_table(sf_dir, table, columns=cols)
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=131072)
    return gather_combine(parts, final)


def _cms_seeds(depth: int) -> np.ndarray:
    """One odd 64-bit salt per row, any depth (golden-ratio multiples)."""
    with np.errstate(over="ignore"):
        return (np.arange(1, depth + 1, dtype=np.uint64)
                * np.uint64(0x9E3779B97F4A7C15))


def cms_update(values: np.ndarray, depth: int = 4,
               width: int = 2048) -> np.ndarray:
    """Count-Min update: hashed int64 values -> (depth, width) count
    matrix, one bincount per row (vectorized)."""
    from geomesa_ray.sources.fixtures import splitmix64

    m = np.zeros((depth, width), dtype=np.int64)
    u = values.view(np.uint64)
    seeds = _cms_seeds(depth)
    for d in range(depth):
        with np.errstate(over="ignore"):
            hd = splitmix64(u ^ seeds[d])
        idx = (hd % np.uint64(width)).astype(np.int64)
        m[d] = np.bincount(idx, minlength=width)
    return m


def cms_query(m: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Point estimates: min over rows (classic CM upper-bounded count:
    true <= est <= true + eps*N with eps = e/width, prob 1-delta,
    delta = e^-depth)."""
    from geomesa_ray.sources.fixtures import splitmix64

    depth, width = m.shape
    u = values.view(np.uint64)
    est = np.full(len(values), np.iinfo(np.int64).max, dtype=np.int64)
    seeds = _cms_seeds(depth)
    for d in range(depth):
        with np.errstate(over="ignore"):
            hd = splitmix64(u ^ seeds[d])
        idx = (hd % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, m[d][idx])
    return est


def frequency_sketch(sf_dir: str, table: str, col: str, depth: int = 4,
                     width: int = 2048) -> np.ndarray:
    """Distributed Count-Min sketch of a column (the ``Frequency`` stat
    of later GeoMesa, stats-service analog): per-batch local sketches
    (pure bincounts) SUM-merge — CM matrices are linear, so the merged
    sketch equals the sketch of the concatenated stream exactly.
    Returns the (depth, width) matrix; query with :func:`cms_query`.
    """
    from geomesa_ray.sources.io import read_table

    def partial(batch: pa.Table) -> pa.Table:
        h = _hash_column(batch.column(col)).view(np.int64)
        m = cms_update(h, depth, width)
        return pa.table({"sk": pa.array([m.reshape(-1)])})

    def final(batch: pa.Table) -> pa.Table:
        stack = np.array(batch.column("sk").to_pylist(), dtype=np.int64)
        return pa.table({"sk": pa.array([stack.sum(axis=0)])})

    ds = read_table(sf_dir, table, columns=[col])
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=131072)
    merged = gather_combine(parts, final).take_all()
    return np.array(merged[0]["sk"], dtype=np.int64) \
        .reshape(depth, width)


class KllSketch:
    """KLL-style mergeable quantile sketch (Karnin-Lang-Liberty 2016),
    deterministic variant: level-``i`` items carry weight ``2^i``; a
    full level sorts and promotes every other item (alternating offset
    per level instead of a random coin, so runs are reproducible),
    dropping the rest. Space O(k log(n/k)); empirical rank error ~1/k
    at the defaults (asserted in tests on uniform/zipf/bimodal data).
    Merging concatenates levels then re-compacts — the distributed
    combine shape.
    """

    def __init__(self, k: int = 200):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.flips: list[bool] = [False]
        self.n = 0

    def _cap(self, i: int) -> int:
        height = len(self.levels)
        return max(8, int(np.ceil(self.k * (2.0 / 3.0)
                                  ** (height - 1 - i))))

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self._cap(i):
                v = np.sort(self.levels[i])
                off = 1 if self.flips[i] else 0
                self.flips[i] = not self.flips[i]
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, np.float64))
                    self.flips.append(False)
                self.levels[i + 1] = np.concatenate(
                    [self.levels[i + 1], v[off::2]])
                self.levels[i] = np.empty(0, np.float64)
            i += 1

    def update_many(self, x: np.ndarray) -> None:
        x = np.asarray(x, np.float64)
        x = x[~np.isnan(x)]
        self.n += len(x)
        self.levels[0] = np.concatenate([self.levels[0], x])
        self._compress()

    def merge(self, other: "KllSketch") -> None:
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
            self.flips.append(False)
        for i, lv in enumerate(other.levels):
            self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self._compress()

    def quantiles(self, qs) -> np.ndarray:
        if self.n == 0:  # empty/all-null input: NaN per quantile
            return np.full(len(list(qs)), np.nan)
        vals = np.concatenate(self.levels)
        wts = np.concatenate(
            [np.full(len(lv), 1 << i, np.int64)
             for i, lv in enumerate(self.levels)])
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        targets = np.asarray(qs, np.float64) * cum[-1]
        idx = np.minimum(np.searchsorted(cum, targets), len(vals) - 1)
        return vals[idx]

    # ---- flat (level, value) serialization for the Arrow combine
    def dump(self) -> tuple[np.ndarray, np.ndarray, int]:
        lvl = np.concatenate(
            [np.full(len(lv), i, np.int64)
             for i, lv in enumerate(self.levels)]) \
            if self.levels else np.empty(0, np.int64)
        return lvl, np.concatenate(self.levels), self.n

    @classmethod
    def load(cls, lvl: np.ndarray, vals: np.ndarray, n: int,
             k: int = 200) -> "KllSketch":
        sk = cls(k)
        height = int(lvl.max()) + 1 if len(lvl) else 1
        sk.levels = [np.asarray(vals[lvl == i], np.float64)
                     for i in range(height)]
        sk.flips = [False] * height
        sk.n = n
        sk._compress()
        return sk


def quantile_sketch(sf_dir: str, table: str, col: str,
                    qs=(0.01, 0.25, 0.5, 0.75, 0.99),
                    k: int = 200, fanin: int = 8) -> ray.data.Dataset:
    """Distributed approximate quantiles of a numeric column: per-batch
    KLL sketches (a few KB regardless of input size) merge through a
    fan-in level, then one final merge emits (q, value) rows. Same
    mergeable-summaries topology as :func:`approx_distinct`."""
    from geomesa_ray.sources.io import read_table

    def partial(batch: pa.Table) -> pa.Table:
        sk = KllSketch(k)
        sk.update_many(batch.column(col).to_numpy(zero_copy_only=False)
                       .astype(np.float64))
        lvl, vals, n = sk.dump()
        return pa.table({"lvl": pa.array([lvl]), "vals": pa.array([vals]),
                         "n": pa.array([n], pa.int64())})

    def merge_rows(batch: pa.Table) -> KllSketch:
        sk = KllSketch(k)
        for i in range(batch.num_rows):
            sk.merge(KllSketch.load(
                np.asarray(batch.column("lvl")[i].as_py(), np.int64),
                np.asarray(batch.column("vals")[i].as_py(), np.float64),
                batch.column("n")[i].as_py(), k))
        return sk

    def level(batch: pa.Table) -> pa.Table:
        lvl, vals, n = merge_rows(batch).dump()
        return pa.table({"lvl": pa.array([lvl]), "vals": pa.array([vals]),
                         "n": pa.array([n], pa.int64())})

    def final(batch: pa.Table) -> pa.Table:
        sk = merge_rows(batch)
        return pa.table({"q": pa.array(list(qs), pa.float64()),
                         "value": pa.array(sk.quantiles(qs)),
                         "n": pa.array([sk.n] * len(qs), pa.int64())})

    ds = read_table(sf_dir, table, columns=[col])
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=131072)
    mid = parts.repartition(fanin).map_batches(
        level, batch_format="pyarrow", batch_size=None)
    return gather_combine(mid, final)
