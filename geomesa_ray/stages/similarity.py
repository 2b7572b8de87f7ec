"""Similarity search over the embeddings table (list<float> column).

Brute-force cosine top-k is the exactness baseline: the query matrix is
broadcast once (``ray.put``), each batch does one matmul against it, emits
a per-batch partial top-k (the combiner), and a tiny
``groupby(query_id)`` merge produces the exact global top-k — identical
shape to the kNN pipeline, so shuffle volume is O(queries x k) regardless
of corpus size. The scale path for 10^12 rows is the same pipeline with an
IVF/LSH bucket prune before the matmul (bucket id = argmax against a
broadcast coarse codebook); documented here, baseline kept exact.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from geomesa_ray.sources.io import read_table


def _embedding_matrix(batch: pa.Table) -> np.ndarray:
    col = batch.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def load_queries(sf_dir: str, num_queries: int) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    t = t.sort_by("vec_id").slice(0, num_queries)
    q = _normalize(_embedding_matrix(t))
    return t.column("vec_id").to_numpy(), q


def topk_cosine(sf_dir: str, num_queries: int = 8, k: int = 10) -> ray.data.Dataset:
    """(query_id, vec_id, sim_rank): exact top-k cosine neighbors of the
    first ``num_queries`` embeddings (self excluded), rank tie-broken by
    vec_id. Partials are bounded (queries x k x n_batches), so one final
    combine task replaces a groupby shuffle."""
    from geomesa_ray.util import gather_combine, resolve_broadcast

    ref = ray.put(load_queries(sf_dir, num_queries))

    def partial(batch: pa.Table) -> pa.Table:
        qids, q = resolve_broadcast(ref)
        x = _normalize(_embedding_matrix(batch))
        vids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        sims = q @ x.T  # (Q, B)
        out_q, out_v, out_c = [], [], []
        n = sims.shape[1]
        for qi in range(len(qids)):
            s = sims[qi]
            kk = min(k + 1, n)  # +1 slack for the self row
            if n > kk:
                thresh = np.partition(s, n - kk)[n - kk]
                cand = np.nonzero(s >= thresh)[0]
            else:
                cand = np.arange(n)
            out_q.append(np.full(len(cand), qids[qi], dtype=np.int64))
            out_v.append(vids[cand])
            out_c.append(s[cand])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "cos": pa.array(np.concatenate(out_c)),
        })

    def final(batch: pa.Table) -> pa.Table:
        qv = batch.column("query_id").to_numpy(zero_copy_only=False)
        v = batch.column("vec_id").to_numpy(zero_copy_only=False)
        c = batch.column("cos").to_numpy(zero_copy_only=False)
        out_q, out_v, out_r = [], [], []
        for qid in np.unique(qv):
            sel = np.nonzero((qv == qid) & (v != qid))[0]  # exclude self
            order = np.lexsort((v[sel], -c[sel]))[:k]
            take = sel[order]
            out_q.append(np.full(len(take), qid, dtype=np.int64))
            out_v.append(v[take])
            out_r.append(np.arange(1, len(take) + 1, dtype=np.int64))
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "sim_rank": pa.array(np.concatenate(out_r)),
        })

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return gather_combine(parts, final)


def topk_cosine_ivf(sf_dir: str, num_queries: int = 8, k: int = 10,
                    n_centroids: int = 16, nprobe: int = 4) -> ray.data.Dataset:
    """IVF-bucketed approximate top-k cosine — the 10^12-row scale path.

    A coarse codebook (here: the first ``n_centroids`` embeddings,
    deterministic; at scale, k-means on a sample) is broadcast. Each query
    selects its ``nprobe`` closest buckets driver-side; each batch then
    assigns its rows to buckets (one matmul against the codebook) and
    computes exact cosines ONLY for (query, row) pairs sharing a probed
    bucket. Partial top-k -> one combine, same as the exact pipeline.
    With ``nprobe == n_centroids`` this degrades to exact brute force
    (verified in tests); smaller nprobe trades recall for a ~nprobe/n
    fraction of the matmul work.
    """
    from geomesa_ray.util import gather_combine, resolve_broadcast

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"]).sort_by("vec_id")
    cent = _normalize(_embedding_matrix(t.slice(0, n_centroids)))
    qids = t.column("vec_id").to_numpy()[:num_queries]
    q = _normalize(_embedding_matrix(t.slice(0, num_queries)))
    # per-query probed buckets (driver-side, tiny)
    qsim = q @ cent.T
    probed = np.argsort(-qsim, axis=1)[:, :nprobe]  # (Q, nprobe)
    ref = ray.put((qids, q, cent, probed))

    def partial(batch: pa.Table) -> pa.Table:
        qids_, q_, cent_, probed_ = resolve_broadcast(ref)
        x = _normalize(_embedding_matrix(batch))
        vids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        bucket = np.argmax(x @ cent_.T, axis=1)  # (B,)
        out_q, out_v, out_c = [], [], []
        for qi in range(len(qids_)):
            m = np.isin(bucket, probed_[qi])
            if not m.any():
                continue
            idx = np.nonzero(m)[0]
            s = q_[qi] @ x[idx].T
            kk = min(k + 1, len(idx))
            if len(idx) > kk:
                thresh = np.partition(s, len(idx) - kk)[len(idx) - kk]
                sel = np.nonzero(s >= thresh)[0]
            else:
                sel = np.arange(len(idx))
            out_q.append(np.full(len(sel), qids_[qi], dtype=np.int64))
            out_v.append(vids[idx[sel]])
            out_c.append(s[sel])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "cos": pa.array(np.concatenate(out_c)),
        })

    def final(batch: pa.Table) -> pa.Table:
        qv = batch.column("query_id").to_numpy(zero_copy_only=False)
        v = batch.column("vec_id").to_numpy(zero_copy_only=False)
        c = batch.column("cos").to_numpy(zero_copy_only=False)
        out_q, out_v, out_r = [], [], []
        for qid in np.unique(qv):
            sel = np.nonzero((qv == qid) & (v != qid))[0]
            order = np.lexsort((v[sel], -c[sel]))[:k]
            take = sel[order]
            out_q.append(np.full(len(take), qid, dtype=np.int64))
            out_v.append(v[take])
            out_r.append(np.arange(1, len(take) + 1, dtype=np.int64))
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim_rank": pa.array([], pa.int64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "sim_rank": pa.array(np.concatenate(out_r)),
        })

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return gather_combine(parts, final)


def embed_neardup(sf_dir: str, tau: float = 0.35) -> ray.data.Dataset:
    """(vec_id_a, vec_id_b, cos): embedding pairs with cosine >= tau,
    a < b — EXACT, via a distributed block-pair self-join.

    All-pairs cosine is intrinsically O(N^2) compute; the scale question
    is data movement. Shape: normalize each block once, pin the blocks in
    the object store as refs (``to_arrow_refs`` — never collected on the
    driver), then fan out one task per (block_i, block_j) pair, i <= j.
    Each task resolves exactly two blocks (worker-cached, zero-copy
    plasma reads on the same node) and does one cross matmul — no
    full-matrix broadcast, no driver materialization, per-task memory
    O(block^2 bits + 2 blocks). An unordered vector pair meets in exactly
    one task (triu within the diagonal block), so no output dedup."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def pack(batch: pa.Table) -> pa.Table:
        m = _normalize(_embedding_matrix(batch))
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "embedding": pa.array(m.tolist(), pa.list_(pa.float64())),
        })

    blocks = ds.map_batches(pack, batch_format="pyarrow",
                            batch_size=65536).to_arrow_refs()
    nb = len(blocks)
    items = [{"i": i, "j": j} for i in range(nb) for j in range(i, nb)]
    work = ray.data.from_items(items, override_num_blocks=len(items))

    from geomesa_ray.util import resolve_broadcast

    empty = pa.table({"vec_id_a": pa.array([], pa.int64()),
                      "vec_id_b": pa.array([], pa.int64()),
                      "cos": pa.array([], pa.float64())})

    def compare(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_c = [], [], []
        for i, j in zip(batch.column("i").to_pylist(),
                        batch.column("j").to_pylist()):
            ti = resolve_broadcast(blocks[i])
            tj = ti if j == i else resolve_broadcast(blocks[j])
            mi = _embedding_matrix(ti)
            mj = mi if j == i else _embedding_matrix(tj)
            ids_i = ti.column("vec_id").to_numpy()
            ids_j = tj.column("vec_id").to_numpy()
            sims = mi @ mj.T
            hit = sims >= tau
            if i == j:
                hit = np.triu(hit, 1)  # each unordered pair once, no self
            ii, jj = np.nonzero(hit)
            if len(ii) == 0:
                continue
            out_a.append(np.minimum(ids_i[ii], ids_j[jj]))
            out_b.append(np.maximum(ids_i[ii], ids_j[jj]))
            out_c.append(sims[ii, jj])
        if not out_a:
            return empty
        return pa.table({
            "vec_id_a": pa.array(np.concatenate(out_a)),
            "vec_id_b": pa.array(np.concatenate(out_b)),
            "cos": pa.array(np.concatenate(out_c)),
        })

    return work.map_batches(compare, batch_format="pyarrow", batch_size=None)
