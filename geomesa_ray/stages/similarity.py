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


class _PartialTopKCos:
    def __init__(self, ref, k):
        self.qids, self.q = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = _normalize(_embedding_matrix(batch))
        vids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        sims = self.q @ x.T  # (Q, B)
        out_q, out_v, out_c = [], [], []
        n = sims.shape[1]
        for qi in range(len(self.qids)):
            s = sims[qi]
            k = min(self.k + 1, n)  # +1 slack for the self row
            if n > k:
                thresh = np.partition(s, n - k)[n - k]
                cand = np.nonzero(s >= thresh)[0]
            else:
                cand = np.arange(n)
            out_q.append(np.full(len(cand), self.qids[qi], dtype=np.int64))
            out_v.append(vids[cand])
            out_c.append(s[cand])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "cos": pa.array(np.concatenate(out_c)),
        })


def topk_cosine(sf_dir: str, num_queries: int = 8, k: int = 10) -> ray.data.Dataset:
    """(query_id, vec_id, sim_rank): exact top-k cosine neighbors of the
    first ``num_queries`` embeddings (self excluded), rank tie-broken by
    vec_id."""
    ref = ray.put(load_queries(sf_dir, num_queries))

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    partial = ds.map_batches(_PartialTopKCos, fn_constructor_args=(ref, k),
                             batch_format="pyarrow", concurrency=(1, 8))

    def final(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        v = group.column("vec_id").to_numpy(zero_copy_only=False)
        c = group.column("cos").to_numpy(zero_copy_only=False)
        m = v != qid  # exclude self
        v, c = v[m], c[m]
        order = np.lexsort((v, -c))[:k]
        return pa.table({
            "query_id": pa.array(np.full(len(order), qid, dtype=np.int64)),
            "vec_id": pa.array(v[order]),
            "sim_rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        })

    return partial.groupby("query_id").map_groups(final, batch_format="pyarrow")


def embed_neardup(sf_dir: str, tau: float = 0.35) -> ray.data.Dataset:
    """(vec_id_a, vec_id_b, cos): embedding pairs with cosine >= tau,
    a < b. The comparison side is broadcast (small at this scale; the
    10^12-row path buckets by coarse quantizer first)."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    all_ids = t.column("vec_id").to_numpy()
    m = _normalize(_embedding_matrix(t))
    ref = ray.put((all_ids, m))

    class Pairs:
        def __init__(self, r):
            self.ids, self.m = ray.get(r) if isinstance(r, ray.ObjectRef) else r

        def __call__(self, batch: pa.Table) -> pa.Table:
            x = _normalize(_embedding_matrix(batch))
            vids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            sims = x @ self.m.T  # (B, N)
            bi, ni = np.nonzero(sims >= tau)
            a = vids[bi]
            b = self.ids[ni]
            keep = a < b  # dedup + drop self
            return pa.table({
                "vec_id_a": pa.array(a[keep]),
                "vec_id_b": pa.array(b[keep]),
                "cos": pa.array(sims[bi[keep], ni[keep]]),
            })

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ds.map_batches(Pairs, fn_constructor_args=(ref,),
                          batch_format="pyarrow", concurrency=(1, 8))
