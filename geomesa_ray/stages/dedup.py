"""Deduplication stages: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (10^12-doc corpora):
- Exact dedup shuffles only (fp, doc_id) skinny pairs — the reference's
  in-memory seen-set (``DeDuplicatingIterator.scala:19-45``, capped at
  999,999 ids) is replaced by a spillable ``groupby(fp)``.
- MinHash+LSH and SimHash are the scalable near-dup paths: signatures are
  computed per-batch (vectorized), candidate generation is a
  ``groupby(band)`` shuffle of skinny (band, doc_id) rows, and only
  candidate PAIRS are exactly verified.
- The exact all-pairs Jaccard op is the verification oracle: quadratic by
  definition, so its pair stage runs on a single coalesced block —
  bounded to small inputs (use the LSH op beyond that; documented).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from geomesa_ray.sources.io import read_table
from geomesa_ray.stages.text_ops import fingerprint_batch

MERSENNE_P = (1 << 61) - 1


def _rename(ds, names):
    return ds.map_batches(lambda b: b.rename_columns(names), batch_format="pyarrow")


def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """(fp, doc_id): min doc id per distinct text (hash-partitioned)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    fp = ds.map_batches(fingerprint_batch, batch_format="pyarrow")
    return _rename(fp.groupby("fp").min("doc_id"), ["fp", "doc_id"])


def _ws_token_hashes(col, mask63: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized whitespace tokenization + 63-bit token hashes for a
    WHOLE string column: one Arrow split (C), one polynomial-hash pass
    over the flattened token buffer (``sketches._hash_string_array``) —
    no per-token Python, the scale-critical path for 10^12-doc corpora.
    Returns (flat token hashes as int64 — positive 63-bit when
    ``mask63``, full 64-bit otherwise (SimHash needs every bit to carry
    signal) — and per-doc offsets); token stream matches ``str.split()``
    (empty boundary tokens from the Arrow splitter are masked out)."""
    import pyarrow.compute as pc

    from geomesa_ray.stages.sketches import _hash_string_array

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.utf8_split_whitespace(col)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    if len(flat) == 0:
        return np.empty(0, dtype=np.int64), offs - offs[0]
    h = _hash_string_array(flat)
    nonempty = pc.greater(pc.utf8_length(flat), 0) \
        .to_numpy(zero_copy_only=False)
    c = np.concatenate([[0], np.cumsum(nonempty.astype(np.int64))])
    offs2 = c[offs - offs[0]]
    h2 = h[nonempty]
    if mask63:
        h2 = h2 & np.uint64(0x7FFFFFFFFFFFFFFF)
    return h2.view(np.int64), offs2


_SHINGLE_MULT = (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F),
                 np.uint64(0x165667B19E3779F9))


def _shingle_hashes_from(th: np.ndarray, k: int = 3) -> np.ndarray:
    """Unique k-token shingle hashes from a doc's token-hash array:
    windows combined positionally with odd multipliers + splitmix
    finalizer — vectorized over the shingle windows."""
    from geomesa_ray.sources.fixtures import splitmix64

    if len(th) == 0:
        return np.empty(0, dtype=np.int64)
    th = th.view(np.uint64)
    if len(th) < k:
        windows = th[None, :]
        k = len(th)
    else:
        windows = np.stack([th[i:len(th) - k + 1 + i] for i in range(k)], axis=1)
    with np.errstate(over="ignore"):
        mixed = np.zeros(len(windows), dtype=np.uint64)
        for j in range(windows.shape[1]):
            mixed ^= windows[:, j] * _SHINGLE_MULT[j % 3]
    return np.unique(splitmix64(mixed).view(np.int64))


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Scalar reference wrapper (tests / single-doc callers) — same
    hash family as the batch path by construction."""
    th, _ = _ws_token_hashes(pa.array([text], pa.string()))
    return _shingle_hashes_from(th, k)


def jaccard_pairs(sf_dir: str, threshold_num: int = 1,
                  threshold_den: int = 2) -> ray.data.Dataset:
    """Exact all-pairs token-set Jaccard >= num/den (default 1/2), emitted
    as (doc_id_a, doc_id_b) with a < b.

    The threshold test is pure integer arithmetic
    (``den * |A∩B| >= num * |A∪B|``) so the DuckDB oracle matches exactly.
    Tokenization is distributed; the pair matrix runs on one coalesced
    block (quadratic oracle op — use minhash_lsh_pairs at scale).
    """

    def tokenize(batch: pa.Table) -> pa.Table:
        h, offs = _ws_token_hashes(batch.column("text"))
        toks = [np.unique(h[offs[i]:offs[i + 1]])
                for i in range(len(offs) - 1)]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "tok": pa.array([t.tolist() for t in toks], pa.list_(pa.int64())),
        })

    def pairs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        toks = [np.asarray(t) for t in batch.column("tok").to_pylist()]
        vocab = {}
        for t in toks:
            for v in t.tolist():
                vocab.setdefault(v, len(vocab))
        m = np.zeros((len(toks), len(vocab)), dtype=np.int32)
        for i, t in enumerate(toks):
            m[i, [vocab[v] for v in t.tolist()]] = 1
        inter = m @ m.T
        sizes = m.sum(axis=1)
        union = sizes[:, None] + sizes[None, :] - inter
        keep = (threshold_den * inter >= threshold_num * union)
        ia, ib = np.nonzero(np.triu(keep, 1))
        a = np.minimum(ids[ia], ids[ib])
        b = np.maximum(ids[ia], ids[ib])
        return pa.table({"doc_id_a": pa.array(a), "doc_id_b": pa.array(b)})

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    tok = ds.map_batches(tokenize, batch_format="pyarrow")
    return tok.repartition(1).map_batches(pairs, batch_format="pyarrow",
                                          batch_size=None)


class _MinHashSig:
    """Per-batch MinHash signatures + LSH band rows. Token hashing is
    one vectorized pass over the batch (``_ws_token_hashes``); the only
    per-doc work is numpy window mixing + the P x S min — no per-token
    Python anywhere. Band hashes fold each signature segment with
    splitmix across the whole (docs x bands) matrix at once."""

    def __init__(self, num_perm: int, bands: int, shingle_k: int):
        from geomesa_ray.sources.fixtures import splitmix64

        # hash family h_i(x) = splitmix64(x XOR seed_i) — a strong mixing
        # family, fully vectorizable in uint64 (no modular bigint math)
        rng = np.random.default_rng(12345)  # fixed seeds — part of the op
        self.seeds = rng.integers(0, 2**63, num_perm).astype(np.uint64)
        self._mix = splitmix64
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k

    def _sig_from_shingles(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.full(self.num_perm, -1, dtype=np.int64)
        v = self._mix(h.view(np.uint64)[None, :] ^ self.seeds[:, None])
        return v.min(axis=1).view(np.int64)

    def signature(self, text: str) -> np.ndarray:
        return self._sig_from_shingles(_shingle_hashes(text, self.shingle_k))

    def __call__(self, batch: pa.Table) -> pa.Table:
        th, offs = _ws_token_hashes(batch.column("text"))
        n = len(offs) - 1
        sig = np.empty((n, self.num_perm), dtype=np.int64)
        for i in range(n):
            sh = _shingle_hashes_from(th[offs[i]:offs[i + 1]], self.shingle_k)
            sig[i] = self._sig_from_shingles(sh)
        seg = sig.view(np.uint64).reshape(n, self.bands, self.rows_per_band)
        acc = np.full((n, self.bands), 0xCBF29CE484222325, dtype=np.uint64)
        for j in range(self.rows_per_band):
            acc = self._mix(acc ^ seg[:, :, j])
        band_hash = (acc & np.uint64(0xFFFFFFFF)).astype(np.int64)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(np.repeat(doc, self.bands)),
            "band_id": pa.array(np.tile(np.arange(self.bands, dtype=np.int64),
                                        n)),
            "band_hash": pa.array(band_hash.ravel()),
        })


def minhash_lsh_pairs(sf_dir: str, num_perm: int = 64, bands: int = 16,
                      shingle_k: int = 3, threshold: float = 0.5,
                      candidate_stage: str = "groupby",
                      join_partitions: int | None = None) -> ray.data.Dataset:
    """Near-dup pairs via MinHash + LSH banding, exactly verified.

    Pipeline: signatures -> band rows -> candidate pairs -> exact
    shingle-Jaccard verification by RE-JOINING the candidate pairs with
    the distributed per-doc shingle sets (two hash joins on doc_id) ->
    (doc_id_a, doc_id_b, jaccard >= threshold). No stage materializes
    the corpus on the driver: verification streams through the same
    shuffle machinery as the candidate stage, so the op holds at
    10^12-doc scale (``join_partitions`` sizes the join shuffle).

    ``candidate_stage``: "groupby" (default) shuffles by band_id and runs
    the run-detection kernel per band partition — the 10^12-doc path, and
    already faster than the single-task "gather" combine from ~5k docs up
    (measured 1.5s vs 3.0s at sf0.1). Both produce identical pairs
    (equality is tested).
    """
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    sig = _MinHashSig(num_perm, bands, shingle_k)  # tiny state: captured
    band_rows = docs.map_batches(sig.__call__, batch_format="pyarrow",
                                 batch_size=65536)

    # Candidate pairs form only within identical (band_id, band_hash)
    # buckets. The kernel below extracts them VECTORIZED over however
    # many buckets land in its input (sorted keys + run detection) —
    # never one UDF call per bucket (that costs ~5 s of per-group
    # overhead at just 5k docs). The two candidate_stage modes differ
    # only in how rows are routed to kernel invocations.
    def bucket_pairs(batch: pa.Table) -> pa.Table:
        bid = batch.column("band_id").to_numpy(zero_copy_only=False)
        bh = batch.column("band_hash").to_numpy(zero_copy_only=False)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        key = (bid << np.int64(33)) | bh  # band_hash is 32-bit crc
        order = np.lexsort((doc, key))
        key, doc = key[order], doc[order]
        _, start, count = np.unique(key, return_index=True, return_counts=True)
        out_a, out_b = [], []
        for s, c in zip(start[count > 1], count[count > 1]):
            ids = doc[s:s + c]
            ia, ib = np.triu_indices(c, 1)
            out_a.append(ids[ia])
            out_b.append(ids[ib])
        if not out_a:
            return pa.table({"doc_id_a": pa.array([], pa.int64()),
                             "doc_id_b": pa.array([], pa.int64())})
        pairs = np.unique(np.stack([np.concatenate(out_a),
                                    np.concatenate(out_b)], axis=1), axis=0)
        return pa.table({"doc_id_a": pa.array(pairs[:, 0]),
                         "doc_id_b": pa.array(pairs[:, 1])})

    from geomesa_ray.util import gather_combine

    if candidate_stage == "groupby":
        # distributed: route whole (band_id, band_hash) buckets to
        # partitions via a 256-way lossless hash of the bucket key —
        # parallelism and per-task memory are bounded by the partition
        # count, not by `bands` (grouping by band_id alone would cap at
        # 16 tasks each holding a full band of the corpus). A pair found
        # by several bands is emitted once per band -> dedup with a
        # built-in groupby.count (no per-group UDF) before verification.
        from geomesa_ray.sources.fixtures import splitmix64

        def add_part(batch: pa.Table) -> pa.Table:
            bid = batch.column("band_id").to_numpy(zero_copy_only=False)
            bh = batch.column("band_hash").to_numpy(zero_copy_only=False)
            key = ((bid << np.int64(33)) | bh).view(np.uint64)
            part = (splitmix64(key) % np.uint64(256)).astype(np.int64)
            return batch.append_column("band_part", pa.array(part))

        # cross-partition duplicate pairs (a pair found by bands routed
        # to DIFFERENT partitions) survive to verification, which de-dups
        # — cheaper than a dedicated pair-dedup shuffle here
        cand = band_rows.map_batches(add_part, batch_format="pyarrow") \
            .groupby("band_part").map_groups(bucket_pairs,
                                             batch_format="pyarrow")
    else:
        cand = gather_combine(band_rows, bucket_pairs)

    # Verification COGROUP (no driver materialization, no hash-join
    # aggregator fleets — measured 3.1 s -> join-free at sf0.1): shingle
    # sets live in a distributed (doc_id, sh) table; stage 1 buckets
    # pair-SIDE rows with shingle rows by doc hash and attaches each
    # side's set (searchsorted within the bucket); stage 2 buckets the
    # attached rows by PAIR hash, reuniting both sides of every pair in
    # one group where the exact Jaccard is computed (duplicate candidate
    # pairs collapse here). Two bucketed groupbys total; shingle bytes
    # ship once per pair side. Shingle sets travel as packed int64 bytes.
    # ``join_partitions`` bounds per-task memory at scale.
    if join_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        join_partitions = min(256, max(8, cpus))
    n_parts = np.uint64(join_partitions)

    from geomesa_ray.sources.fixtures import splitmix64

    def tokenize_sh(batch: pa.Table) -> pa.Table:
        th, offs = _ws_token_hashes(batch.column("text"))
        sh = [_shingle_hashes_from(th[offs[i]:offs[i + 1]],
                                   shingle_k).tobytes()
              for i in range(len(offs) - 1)]
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        part = (splitmix64(doc.view(np.uint64)) % n_parts).astype(np.int64)
        return pa.table({"doc": batch.column("doc_id"),
                         "a": pa.array(np.zeros(len(doc), np.int64)),
                         "b": pa.array(np.zeros(len(doc), np.int64)),
                         "sh": pa.array(sh, pa.binary()),
                         "is_sh": pa.array(np.ones(len(doc), np.int8)),
                         "part": pa.array(part)})

    def pair_side_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_id_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_id_b").to_numpy(zero_copy_only=False)
        doc = np.concatenate([a, b])  # one row per pair SIDE
        part = (splitmix64(doc.view(np.uint64)) % n_parts).astype(np.int64)
        n = len(doc)
        return pa.table({"doc": pa.array(doc),
                         "a": pa.array(np.concatenate([a, a])),
                         "b": pa.array(np.concatenate([b, b])),
                         "sh": pa.array([b""] * n, pa.binary()),
                         "is_sh": pa.array(np.zeros(n, np.int8)),
                         "part": pa.array(part)})

    def pair_part(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        h = splitmix64(a.view(np.uint64) ^ splitmix64(b.view(np.uint64)))
        return (h % n_parts).astype(np.int64)

    def attach(group: pa.Table) -> pa.Table:
        """Attach this bucket's shingle sets to its pair-side rows."""
        is_sh = group.column("is_sh").to_numpy(zero_copy_only=False) == 1
        doc = group.column("doc").to_numpy(zero_copy_only=False)
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        sh_col = group.column("sh")
        if isinstance(sh_col, pa.ChunkedArray):
            sh_col = sh_col.combine_chunks()
        sd = doc[is_sh]
        order = np.argsort(sd)
        sh_idx = np.nonzero(is_sh)[0][order]
        sd = sd[order]
        pd_, pa_, pb_ = doc[~is_sh], a[~is_sh], b[~is_sh]
        if len(sd) == 0 or len(pd_) == 0:
            return pa.table({"doc": pa.array([], pa.int64()),
                             "a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "sh": pa.array([], pa.binary()),
                             "part": pa.array([], pa.int64())})
        pos = np.clip(np.searchsorted(sd, pd_), 0, len(sd) - 1)
        hit = sd[pos] == pd_
        take = pa.array(sh_idx[pos[hit]])
        return pa.table({"doc": pa.array(pd_[hit]),
                         "a": pa.array(pa_[hit]),
                         "b": pa.array(pb_[hit]),
                         "sh": sh_col.take(take),
                         "part": pa.array(pair_part(pa_[hit], pb_[hit]))})

    def verify_group(group: pa.Table) -> pa.Table:
        """Both sides of every pair meet here: exact shingle Jaccard,
        duplicate candidate pairs collapse via the unique-pair walk."""
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        doc = group.column("doc").to_numpy(zero_copy_only=False)
        sh = group.column("sh").to_pylist()
        order = np.lexsort((doc, b, a))
        a, b, doc = a[order], b[order], doc[order]
        key = np.stack([a, b], axis=1)
        _, start = np.unique(key, axis=0, return_index=True)
        start = np.sort(start)
        ends = np.append(start[1:], len(a))
        out_a, out_b, out_j = [], [], []
        for s, e in zip(start, ends):
            sa = sb = None
            for i in range(s, e):
                if doc[i] == a[i] and sa is None:
                    sa = np.frombuffer(sh[order[i]], dtype=np.int64)
                elif doc[i] == b[i] and sb is None:
                    sb = np.frombuffer(sh[order[i]], dtype=np.int64)
            if sa is None or sb is None:
                continue  # a side's doc id missing from the corpus
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            jac = inter / union if union else 0.0
            if jac >= threshold:
                out_a.append(int(a[s]))
                out_b.append(int(b[s]))
                out_j.append(jac)
        return pa.table({"doc_id_a": pa.array(out_a, pa.int64()),
                         "doc_id_b": pa.array(out_b, pa.int64()),
                         "jaccard": pa.array(out_j, pa.float64())})

    tok = docs.map_batches(tokenize_sh, batch_format="pyarrow",
                           batch_size=65536)
    sides = cand.map_batches(pair_side_rows, batch_format="pyarrow")
    attached = tok.union(sides).groupby("part") \
        .map_groups(attach, batch_format="pyarrow")
    return attached.groupby("part").map_groups(verify_group,
                                               batch_format="pyarrow")


# Above this pair count the single-task union-find (a Python loop over
# edges in ONE combine task) is routed to the distributed min-label
# propagation instead. 2M edges ≈ 32 MB skinny table and ~2 s of
# union-find — comfortably single-task; beyond it the distributed
# path's fixed shuffle cost amortizes.
DISTRIBUTED_PAIR_THRESHOLD = 2_000_000


def dedup_clusters(pairs_ds: ray.data.Dataset,
                   id_cols=("doc_id_a", "doc_id_b"),
                   mode: str = "auto",
                   threshold: int = DISTRIBUTED_PAIR_THRESHOLD
                   ) -> ray.data.Dataset:
    """Near-dup pairs -> connected components: (doc_id, cluster_id) with
    cluster_id = min doc id in the component (the canonical-survivor
    rule). The pair list is usually tiny relative to the corpus (it's
    the dedup output), so union-find runs in one combine task; when the
    pair count exceeds ``threshold`` (``mode="auto"``, the default)
    the call routes itself to :func:`dedup_clusters_distributed` —
    iterated min-label propagation, no single task ever holds the full
    edge set. ``mode="single"`` / ``mode="distributed"`` force a path
    (both produce identical output — equality-tested)."""
    from geomesa_ray.util import gather_combine

    skinny = pairs_ds.select_columns(list(id_cols))
    if mode == "auto":
        # the skinny 2-column pair table is output-sized; materializing
        # it to count is bounded by the dedup output, not the corpus
        skinny = skinny.materialize()
        mode = ("distributed" if skinny.count() > threshold else "single")
    if mode == "distributed":
        return dedup_clusters_distributed(skinny, id_cols)
    if mode != "single":
        raise ValueError(f"unknown dedup_clusters mode {mode!r}")
    pairs_ds = skinny

    def components(batch: pa.Table) -> pa.Table:
        a = batch.column(id_cols[0]).to_numpy(zero_copy_only=False)
        b = batch.column(id_cols[1]).to_numpy(zero_copy_only=False)
        nodes = np.unique(np.concatenate([a, b]))
        idx = {int(v): i for i, v in enumerate(nodes)}
        parent = np.arange(len(nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(a.tolist(), b.tolist()):
            rx, ry = find(idx[x]), find(idx[y])
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)
        roots = np.array([find(i) for i in range(len(nodes))])
        # canonical id = min doc id per component
        order = np.argsort(roots, kind="stable")
        rs = roots[order]
        ns = nodes[order]
        uniq, start = np.unique(rs, return_index=True)
        mins = np.minimum.reduceat(ns, start)
        root_min = dict(zip(uniq.tolist(), mins.tolist()))
        cluster = np.array([root_min[int(r)] for r in roots])
        return pa.table({"doc_id": pa.array(nodes),
                         "cluster_id": pa.array(cluster)})

    return gather_combine(pairs_ds, components)


def dedup_clusters_distributed(pairs_ds: ray.data.Dataset,
                               id_cols=("doc_id_a", "doc_id_b"),
                               n_parts: int = 64,
                               max_iters: int = 64) -> ray.data.Dataset:
    """Near-dup pairs -> connected components by ITERATED MIN-LABEL
    PROPAGATION — the distributed path for pair volumes too large for
    the single-task union-find (:func:`dedup_clusters`): no stage ever
    holds the full edge set or label table in one task.

    State is a (node, label) table hash-bucketed by node. Each round
    routes edges by their v endpoint to the partition holding v's label
    (one bucketed groupby over the union of edge rows and label rows),
    emits the proposal label(v) for u, and lowers each node's label to
    the min of its current label and all proposals (second bucketed
    groupby). Labels are monotone non-increasing, so convergence is a
    cheap sum(label) fixpoint; rounds needed = component diameter
    (near-dup clusters are shallow). Output matches
    :func:`dedup_clusters` exactly (tested): (doc_id, cluster_id =
    min doc id in the component)."""
    from geomesa_ray.sources.fixtures import splitmix64

    a_col, b_col = id_cols

    def part_of(arr: np.ndarray) -> np.ndarray:
        return (splitmix64(arr.view(np.uint64))
                % np.uint64(n_parts)).astype(np.int64)

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).to_numpy(zero_copy_only=False)
        b = batch.column(b_col).to_numpy(zero_copy_only=False)
        return pa.table({"u": pa.array(np.concatenate([a, b])),
                         "v": pa.array(np.concatenate([b, a]))})

    blocks_cap = max(4, min(n_parts, 16))
    edges = pairs_ds.map_batches(to_edges, batch_format="pyarrow") \
        .repartition(blocks_cap).materialize()

    def min_by_node(group: pa.Table) -> pa.Table:
        node = group.column("node").to_numpy(zero_copy_only=False)
        lab = group.column("label").to_numpy(zero_copy_only=False)
        order = np.lexsort((lab, node))
        ns, ls = node[order], lab[order]
        uniq, start = np.unique(ns, return_index=True)
        return pa.table({"node": pa.array(uniq),
                         "label": pa.array(ls[start])})

    def bucket_min(ds: ray.data.Dataset) -> ray.data.Dataset:
        def tag(batch: pa.Table) -> pa.Table:
            n = batch.column("node").to_numpy(zero_copy_only=False)
            return batch.append_column("part", pa.array(part_of(n)))

        return ds.map_batches(tag, batch_format="pyarrow") \
            .groupby("part").map_groups(min_by_node, batch_format="pyarrow")

    def init_labels(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(u),
                         "label": pa.array(np.minimum(u, v))})

    labels = bucket_min(edges.map_batches(init_labels,
                                          batch_format="pyarrow"))
    labels = labels.repartition(blocks_cap).materialize()
    from ray.data.aggregate import Sum

    cur_sum = None

    def edge_rows(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        return pa.table({"key": pa.array(v), "node": batch.column("u"),
                         "label": pa.array(np.zeros(len(v), np.int64)),
                         "is_lab": pa.array(np.zeros(len(v), np.int8)),
                         "part": pa.array(part_of(v))})

    def label_rows(batch: pa.Table) -> pa.Table:
        n = batch.column("node").to_numpy(zero_copy_only=False)
        return pa.table({"key": pa.array(n), "node": batch.column("node"),
                         "label": batch.column("label"),
                         "is_lab": pa.array(np.ones(len(n), np.int8)),
                         "part": pa.array(part_of(n))})

    def attach(group: pa.Table) -> pa.Table:
        """Emit (node=u, label(v)) for every edge row in this bucket,
        looking v up in the co-located label rows (searchsorted)."""
        is_lab = group.column("is_lab").to_numpy(zero_copy_only=False) == 1
        key = group.column("key").to_numpy(zero_copy_only=False)
        node = group.column("node").to_numpy(zero_copy_only=False)
        lab = group.column("label").to_numpy(zero_copy_only=False)
        vl, ll = key[is_lab], lab[is_lab]
        eu, ev = node[~is_lab], key[~is_lab]
        if len(vl) == 0 or len(eu) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64())})
        order = np.argsort(vl)
        vl, ll = vl[order], ll[order]
        pos = np.clip(np.searchsorted(vl, ev), 0, len(vl) - 1)
        hit = vl[pos] == ev
        return pa.table({"node": pa.array(eu[hit]),
                         "label": pa.array(ll[pos[hit]])})

    def jump_rows(batch: pa.Table) -> pa.Table:
        """Pointer-jumping query rows: ask for label(label(node)) so a
        component of diameter D converges in O(log D) rounds instead of
        D (the chain case would otherwise need one round per hop)."""
        lab = batch.column("label").to_numpy(zero_copy_only=False)
        n = len(lab)
        return pa.table({"key": pa.array(lab), "node": batch.column("node"),
                         "label": pa.array(np.zeros(n, np.int64)),
                         "is_lab": pa.array(np.zeros(n, np.int8)),
                         "part": pa.array(part_of(lab))})

    e_tagged = edges.map_batches(edge_rows,
                                 batch_format="pyarrow").materialize()


    for _ in range(max_iters):
        proposals = e_tagged.union(
            labels.map_batches(jump_rows, batch_format="pyarrow"),
            labels.map_batches(label_rows, batch_format="pyarrow"),
        ).groupby("part").map_groups(attach, batch_format="pyarrow")
        # cap the block count before materializing: groupby output
        # blocks otherwise compound through the per-round unions and the
        # fixed per-block scheduling cost grows superlinearly
        merged = bucket_min(labels.union(proposals)) \
            .repartition(blocks_cap).materialize()
        new_sum = merged.aggregate(Sum("label"))["sum(label)"]
        labels = merged
        if new_sum == cur_sum:  # monotone mins: fixpoint reached
            break
        cur_sum = new_sum

    return _rename(labels, ["doc_id", "cluster_id"])


def _simhash_batch(col) -> np.ndarray:
    """SimHash over the token MULTISET for a whole string column —
    vectorized end to end: one tokenization+hash pass, one (tokens x 64)
    bit expansion, per-doc bit sums via a cumsum difference (safe for
    empty docs), majority vote, repack. int64 signed values."""
    th, offs = _ws_token_hashes(col, mask63=False)  # bit 63 carries signal
    n = len(offs) - 1
    if len(th) == 0:
        return np.zeros(n, dtype=np.int64)
    u = th.view(np.uint64)
    bits = ((u[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    contrib = 2 * bits - 1
    c = np.vstack([np.zeros((1, 64), dtype=np.int64),
                   np.cumsum(contrib, axis=0)])
    seg = c[offs[1:]] - c[offs[:-1]]  # (docs, 64) signed bit sums
    out = ((seg > 0).astype(np.uint64)
           << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
    return out.astype(np.uint64).view(np.int64)


def _simhash64(text: str) -> int:
    """Scalar reference wrapper — same hash family as the batch path."""
    return int(_simhash_batch(pa.array([text], pa.string()))[0])


def simhash_pairs(sf_dir: str, max_hamming: int = 3,
                  candidate_stage: str = "groupby") -> ray.data.Dataset:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    4-band pigeonhole: any pair within Hamming 3 agrees exactly on at
    least one 16-bit band, so banding loses no pairs.

    ``candidate_stage``: "groupby" (default) routes whole
    (band_id, band_val) buckets to 256 hash partitions and runs the
    pair kernel per partition — the 10^12-doc path, same routing as
    :func:`minhash_lsh_pairs` (a pair found by several bands lands in
    several partitions, so a built-in groupby de-dups after); "gather"
    is the single-combine-task variant (small inputs, kept for the
    equality test).
    """

    def sig(batch: pa.Table) -> pa.Table:
        s = _simhash_batch(batch.column("text"))
        u = s.view(np.uint64)
        # (docs, 4) 16-bit bands, unsigned extraction — fully vectorized
        band_vals = ((u[:, None] >> (np.uint64(16)
                                     * np.arange(4, dtype=np.uint64)[None, :]))
                     & np.uint64(0xFFFF)).astype(np.int64)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(doc)
        return pa.table({
            "doc_id": pa.array(np.repeat(doc, 4)),
            "band_id": pa.array(np.tile(np.arange(4, dtype=np.int64), n)),
            "band_val": pa.array(band_vals.ravel()),
            "simhash": pa.array(np.repeat(s, 4)),
        })

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    rows = docs.map_batches(sig, batch_format="pyarrow", batch_size=65536)

    # same skinny-table combine as minhash: vectorized run detection over
    # sorted (band_id, band_val) keys, hamming popcount per pair, dedup
    def bucket_pairs(batch: pa.Table) -> pa.Table:
        bid = batch.column("band_id").to_numpy(zero_copy_only=False)
        bv = batch.column("band_val").to_numpy(zero_copy_only=False)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sh = batch.column("simhash").to_numpy(zero_copy_only=False)
        key = (bid << np.int64(17)) | bv  # band_val is 16-bit
        order = np.lexsort((doc, key))
        key, doc, sh = key[order], doc[order], sh[order]
        _, start, count = np.unique(key, return_index=True, return_counts=True)
        out_a, out_b, out_h = [], [], []
        for s, c in zip(start[count > 1], count[count > 1]):
            ids = doc[s:s + c]
            hs = sh[s:s + c]
            ia, ib = np.triu_indices(c, 1)
            x = hs[ia].view(np.uint64) ^ hs[ib].view(np.uint64)
            ham = np.zeros(len(x), dtype=np.int64)
            v = x.copy()
            for _ in range(64):
                ham += (v & np.uint64(1)).astype(np.int64)
                v >>= np.uint64(1)
            keep = ham <= max_hamming
            out_a.append(ids[ia][keep])
            out_b.append(ids[ib][keep])
            out_h.append(ham[keep])
        if not out_a:
            return pa.table({"doc_id_a": pa.array([], pa.int64()),
                             "doc_id_b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        h = np.concatenate(out_h)
        trip = np.unique(np.stack([a, b, h], axis=1), axis=0)
        # one row per pair (hamming is identical across bands for a pair);
        # dedup on the 2-column pair array — a packed scalar key would
        # wrap/collide for doc_id >= 2^31
        _, first = np.unique(trip[:, :2], axis=0, return_index=True)
        trip = trip[first]
        return pa.table({"doc_id_a": pa.array(trip[:, 0]),
                         "doc_id_b": pa.array(trip[:, 1]),
                         "hamming": pa.array(trip[:, 2])})

    from geomesa_ray.util import gather_combine

    if candidate_stage != "groupby":
        return gather_combine(rows, bucket_pairs)

    from geomesa_ray.sources.fixtures import splitmix64

    def add_part(batch: pa.Table) -> pa.Table:
        bid = batch.column("band_id").to_numpy(zero_copy_only=False)
        bv = batch.column("band_val").to_numpy(zero_copy_only=False)
        key = ((bid << np.int64(17)) | bv).view(np.uint64)
        part = (splitmix64(key) % np.uint64(256)).astype(np.int64)
        return batch.append_column("band_part", pa.array(part))

    cand = rows.map_batches(add_part, batch_format="pyarrow") \
        .groupby("band_part").map_groups(bucket_pairs,
                                         batch_format="pyarrow")
    # hamming is identical across bands for a pair, so grouping by the
    # full triple de-dups cross-partition copies without losing it
    return cand.groupby(["doc_id_a", "doc_id_b", "hamming"]).count() \
        .select_columns(["doc_id_a", "doc_id_b", "hamming"])
