"""Training-data op tests: text analysis, dedup (exact / jaccard /
minhash-LSH / simhash), similarity search — each against an independent
brute-force oracle."""

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def docs_table():
    return pq.read_table(f"{SF}/documents.parquet")


class TestTextOps:
    def test_token_count_oracle(self, ray_session):
        from geomesa_ray.stages.text_ops import token_counts

        got = {r["doc_id"]: r["n_tokens"] for r in token_counts(SF).take_all()}
        t = docs_table()
        for d, txt in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist()):
            assert got[d] == len(txt.split()), f"doc {d}"

    def test_fingerprint_matches_hashlib(self, ray_session):
        import hashlib

        from geomesa_ray.stages.text_ops import fingerprints

        got = {r["doc_id"]: r["fp"] for r in fingerprints(SF).take_all()}
        t = docs_table()
        for d, txt in list(zip(t.column("doc_id").to_pylist(),
                               t.column("text").to_pylist()))[:50]:
            assert got[d] == hashlib.md5(txt.encode()).hexdigest()

    def test_lang_id_runs_and_deterministic(self, ray_session):
        from geomesa_ray.stages.text_ops import lang_id

        rows = lang_id(SF).take_all()
        assert len(rows) == docs_table().num_rows
        assert all(r["lang_pred"] in {"en", "es", "fr", "de", "und"} for r in rows)

    def test_lang_id_vectorized_matches_scalar(self):
        """The vectorized scoring (hashed-stopword isin + offset cumsum)
        must be bit-identical to the per-doc scalar algorithm it
        replaced — including empty docs, whitespace-only docs,
        cross-language ties, and non-ASCII whitespace (RE2 \\s does not
        split U+00A0, so 'the\\u00a0la' is ONE token)."""
        import pyarrow.compute as pc

        from geomesa_ray.stages.text_ops import _LANG_PROFILES, LangIdStage

        texts = ["", "   ", "the the the", "The quick brown fox and the dog",
                 "el la de que y en un es", "le la de et un que pour dans",
                 "der die das und ist", "de la", "the la", "xyzzy qwer",
                 "  the  ", "la de"] + \
            docs_table().column("text").to_pylist()[:200]
        ids = list(range(len(texts)))
        batch = pa.table({"doc_id": pa.array(ids, pa.int64()),
                          "text": pa.array(texts, pa.string())})

        # scalar reference: the original per-doc loop, verbatim
        profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}
        low = pc.utf8_lower(batch.column("text"))
        preds, confs = [], []
        for toks in pc.split_pattern_regex(low, pattern=r"\s+").to_pylist():
            toks = [t for t in toks if t]
            if not toks:
                preds.append("und")
                confs.append(0.0)
                continue
            scores = {k: sum(1 for w in toks if w in p)
                      for k, p in profiles.items()}
            best = max(sorted(scores), key=lambda k: scores[k])
            preds.append(best if scores[best] > 0 else "und")
            confs.append(scores[best] / len(toks))

        out = LangIdStage()(batch)
        assert out.column("lang_pred").to_pylist() == preds
        assert out.column("lang_conf").to_pylist() == confs  # bit-exact


def tokens_of(txt):
    return set(txt.split())


class TestDedup:
    def test_exact_dedup_oracle(self, ray_session):
        from geomesa_ray.stages.dedup import exact_dedup

        got = {(r["fp"], r["doc_id"]) for r in exact_dedup(SF).take_all()}
        t = docs_table()
        best = {}
        import hashlib

        for d, txt in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist()):
            fp = hashlib.md5(txt.encode()).hexdigest()
            best[fp] = min(best.get(fp, d), d)
        assert got == set(best.items())

    def test_jaccard_pairs_oracle(self, ray_session):
        from geomesa_ray.stages.dedup import jaccard_pairs

        got = {(r["doc_id_a"], r["doc_id_b"]) for r in jaccard_pairs(SF).take_all()}
        t = docs_table()
        ids = t.column("doc_id").to_pylist()
        toks = [tokens_of(x) for x in t.column("text").to_pylist()]
        want = set()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(toks[i] & toks[j])
                union = len(toks[i] | toks[j])
                if 2 * inter >= union:
                    a, b = sorted((ids[i], ids[j]))
                    want.add((a, b))
        assert got == want

    def test_minhash_pairs_precise_and_recalls_near_dups(self, ray_session):
        """LSH with 16 bands x 4 rows at J>=0.8 has recall ~1; verification
        makes precision exact. Build a corpus with known near-dups."""
        import ray

        from geomesa_ray.stages.dedup import _MinHashSig, _shingle_hashes

        # planted corpus: 10 base docs, each with a near-identical copy
        base = [" ".join(f"w{(i * 31 + j) % 97}" for j in range(50)) for i in range(10)]
        texts = base + [b.replace("w1 ", "w1x ") if "w1 " in b else b + " extra"
                        for b in base]
        ids = list(range(len(texts)))
        tmp = "/tmp/graft_fixtures/_lshtest"
        import os

        os.makedirs(tmp, exist_ok=True)
        pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts, pa.string())}),
                       f"{tmp}/documents.parquet")
        from geomesa_ray.stages.dedup import minhash_lsh_pairs

        got = {(r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
               for r in minhash_lsh_pairs(tmp, threshold=0.5).take_all()}
        # oracle: exact shingle jaccard over all pairs
        sh = [set(_shingle_hashes(t).tolist()) for t in texts]
        want = {}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(sh[i] & sh[j])
                union = len(sh[i] | sh[j])
                jac = inter / union if union else 0.0
                if jac >= 0.5:
                    want[(i, j)] = jac
        # precision: everything returned is a true >=0.5 pair w/ exact value
        for k, v in got.items():
            assert k in want and abs(v - want[k]) < 1e-12
        # recall: the planted near-identical copies must be found
        planted = {(i, i + 10) for i in range(10) if (i, i + 10) in want}
        assert planted.issubset(set(got)), f"missed planted dups {planted - set(got)}"

    def test_simhash_pairs_exact_for_small_hamming(self, ray_session):
        from geomesa_ray.stages.dedup import _simhash64, simhash_pairs

        got = {(r["doc_id_a"], r["doc_id_b"]): r["hamming"]
               for r in simhash_pairs(SF).take_all()}
        t = docs_table()
        ids = t.column("doc_id").to_pylist()
        sigs = [_simhash64(x) for x in t.column("text").to_pylist()]
        want = {}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                ham = bin((sigs[i] ^ sigs[j]) & 0xFFFFFFFFFFFFFFFF).count("1")
                if ham <= 3:
                    a, b = sorted((ids[i], ids[j]))
                    want[(a, b)] = ham
        assert got == want  # pigeonhole banding loses nothing


class TestSimilarity:
    def _emb(self):
        t = pq.read_table(f"{SF}/embeddings.parquet")
        m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        return t.column("vec_id").to_numpy(), m

    def test_topk_cosine_oracle(self, ray_session):
        from geomesa_ray.stages.similarity import topk_cosine

        ids, m = self._emb()
        got = {}
        for r in topk_cosine(SF, num_queries=8, k=10).take_all():
            got.setdefault(r["query_id"], []).append((r["sim_rank"], r["vec_id"]))
        for qi in range(8):
            # independent per-query scalar loop oracle
            sims = [(float(m[qi] @ m[j]), int(ids[j]))
                    for j in range(len(ids)) if ids[j] != ids[qi]]
            sims.sort(key=lambda t: (-t[0], t[1]))
            want = [v for _, v in sims[:10]]
            rows = sorted(got[ids[qi]])
            assert [v for _, v in rows] == want, f"query {qi}"

    def _neardup_want(self):
        ids, m = self._emb()
        cos = m @ m.T
        ia, ib = np.nonzero(cos >= 0.35)
        return {(int(ids[i]), int(ids[j])) for i, j in zip(ia, ib)
                if ids[i] < ids[j]}

    def test_embed_neardup_exact_oracle(self, ray_session):
        from geomesa_ray.stages.similarity import embed_neardup

        got = {(r["vec_id_a"], r["vec_id_b"])
               for r in embed_neardup(SF, mode="exact").take_all()}
        assert got == self._neardup_want()

    def test_embed_neardup_ivf_full_probe_is_exact(self, ray_session):
        # assign == n_centroids: every pair shares every bucket, so the
        # bucketed path must reproduce the oracle EXACTLY (and each pair
        # exactly once — a duplicate emission would break the set/count)
        from geomesa_ray.stages.similarity import embed_neardup

        rows = embed_neardup(SF, n_centroids=8, assign=8).take_all()
        got = [(r["vec_id_a"], r["vec_id_b"]) for r in rows]
        want = self._neardup_want()
        assert set(got) == want
        assert len(got) == len(want)  # min-common-bucket rule: no dups

    def test_kmeans_codebook_deterministic_and_valid(self):
        from geomesa_ray.stages.similarity import kmeans_codebook

        _, m = self._emb()
        a = kmeans_codebook(m, 8)
        b = kmeans_codebook(m, 8)
        assert np.array_equal(a, b)  # no RNG anywhere
        assert np.allclose(np.linalg.norm(a, axis=1), 1.0)
        # k-means must not collapse: centroids stay distinct
        assert len(np.unique(a.round(9), axis=0)) == 8

    def test_embed_neardup_kmeans_codebook_recall(self, ray_session):
        # the kmeans codebook is a drop-in: still a subset of the oracle
        # pairs, exactly-once, with recall at least as usable as first-N
        from geomesa_ray.stages.similarity import embed_neardup

        rows = embed_neardup(SF, codebook="kmeans").take_all()
        got = [(r["vec_id_a"], r["vec_id_b"]) for r in rows]
        want = self._neardup_want()
        assert set(got) <= want
        assert len(got) == len(set(got))
        assert len(got) >= 0.9 * len(want)

    def test_topk_ivf_kmeans_full_probe_exact(self, ray_session):
        from geomesa_ray.stages.similarity import topk_cosine, topk_cosine_ivf

        exact = {(r["query_id"], r["sim_rank"], r["vec_id"])
                 for r in topk_cosine(SF).take_all()}
        ivf = {(r["query_id"], r["sim_rank"], r["vec_id"])
               for r in topk_cosine_ivf(SF, n_centroids=8, nprobe=8,
                                        codebook="kmeans").take_all()}
        assert ivf == exact  # full probe: bucketing is lossless

    def test_embed_neardup_ivf_default_recall(self, ray_session):
        # default multi-probe: a subset of the oracle pairs, no dups, and
        # recall on this fixture's near-dup structure stays high
        from geomesa_ray.stages.similarity import embed_neardup

        rows = embed_neardup(SF).take_all()
        got = [(r["vec_id_a"], r["vec_id_b"]) for r in rows]
        want = self._neardup_want()
        assert set(got) <= want          # never a false positive
        assert len(got) == len(set(got))  # exactly-once emission
        assert len(got) >= 0.9 * len(want), \
            f"recall {len(got)}/{len(want)} below fixture floor"


class TestImageOps:
    def test_image_stats(self, ray_session, tiny_fixtures):
        from geomesa_ray.sources.fixtures import gen_images_table
        from geomesa_ray.stages.image_ops import image_stats

        rows = {r["image_id"]: r for r in image_stats(tiny_fixtures).take_all()}
        t = gen_images_table(6000)
        for i in range(20):
            rid = t.column("image_id")[i].as_py()
            px = np.frombuffer(t.column("bytes")[i].as_py(), np.uint8).reshape(8, 8, 3)
            assert abs(rows[rid]["mean_r"] - px[:, :, 0].mean()) < 1e-9

    def test_image_resize_and_psnr(self, ray_session, tiny_fixtures):
        from geomesa_ray.stages.image_ops import image_resize, psnr

        rows = image_resize(tiny_fixtures, 4, 4).take_all()
        assert all(len(r["bytes"]) == 4 * 4 * 3 for r in rows[:50])
        # identity resize preserves pixels exactly (PSNR = inf >= 40)
        same = image_resize(tiny_fixtures, 8, 8).take_all()
        from geomesa_ray.sources.fixtures import gen_images_table

        t = gen_images_table(6000)
        orig = {t.column("image_id")[i].as_py(): t.column("bytes")[i].as_py()
                for i in range(100)}
        checked = 0
        for r in same:
            if r["image_id"] in orig:
                a = np.frombuffer(orig[r["image_id"]], np.uint8)
                b = np.frombuffer(r["bytes"], np.uint8)
                assert psnr(a, b) == float("inf")
                checked += 1
        assert checked == 100

    def test_compressed_decode_paths(self):
        """png/jpeg/bmp now decode for real (geomesa_ray.codecs);
        malformed bytes raise ValueError, and formats without a codec
        keep the honest NotImplementedError gate."""
        from geomesa_ray.stages.image_ops import decode_batch

        def one(fmt, payload):
            return pa.table({
                "image_id": pa.array(["x"]),
                "bytes": pa.array([payload], pa.binary()),
                "w": pa.array([2], pa.int32()), "h": pa.array([1], pa.int32()),
                "fmt": pa.array([fmt]),
            })

        with pytest.raises(ValueError):
            decode_batch(one("png", b"zz"))
        with pytest.raises(NotImplementedError):
            decode_batch(one("webp", b"zz"))
        from geomesa_ray.codecs import encode

        px = np.arange(6, dtype=np.uint8).reshape(1, 2, 3)
        (out,) = decode_batch(one("png", encode(px, "png")))
        assert np.array_equal(out, px)


class TestIVF:
    def test_full_probe_equals_exact(self, ray_session):
        from geomesa_ray.stages.similarity import topk_cosine, topk_cosine_ivf

        exact = {(r["query_id"], r["sim_rank"]): r["vec_id"]
                 for r in topk_cosine(SF).take_all()}
        ivf = {(r["query_id"], r["sim_rank"]): r["vec_id"]
               for r in topk_cosine_ivf(SF, n_centroids=16, nprobe=16).take_all()}
        assert ivf == exact  # probing every bucket must be exact

    def test_partial_probe_recall(self, ray_session):
        from geomesa_ray.stages.similarity import topk_cosine, topk_cosine_ivf

        exact = {}
        for r in topk_cosine(SF).take_all():
            exact.setdefault(r["query_id"], set()).add(r["vec_id"])
        ivf = {}
        for r in topk_cosine_ivf(SF, n_centroids=16, nprobe=6).take_all():
            ivf.setdefault(r["query_id"], set()).add(r["vec_id"])
        recalls = [len(ivf.get(q, set()) & s) / len(s) for q, s in exact.items()]
        assert sum(recalls) / len(recalls) > 0.3  # random embeddings: modest


class TestMultimodalStubs:
    def test_frame_sample(self, ray_session):
        import ray.data

        from geomesa_ray.stages.image_ops import FrameSample

        # synthetic rawvid: 6 frames of 2x2x3
        frame = bytes(range(12))
        vid = frame * 6
        t = pa.table({
            "image_id": pa.array(["v0"]), "bytes": pa.array([vid], pa.binary()),
            "w": pa.array([2], pa.int32()), "h": pa.array([2], pa.int32()),
            "fmt": pa.array(["rawvid"]),
        })
        out = ray.data.from_arrow(t).map_batches(
            FrameSample, fn_constructor_args=(2,), batch_format="pyarrow",
            concurrency=1).take_all()
        assert [r["frame"] for r in out] == [0, 2, 4]
        assert all(r["bytes"] == frame for r in out)

    def test_audio_features(self, ray_session):
        import ray.data

        from geomesa_ray.stages.image_ops import AudioFeatures

        x = np.array([100, -100] * 50, dtype="<i2")
        t = pa.table({
            "image_id": pa.array(["a0"]),
            "bytes": pa.array([x.tobytes()], pa.binary()),
            "fmt": pa.array(["pcm16"]),
        })
        out = ray.data.from_arrow(t).map_batches(
            AudioFeatures, batch_format="pyarrow", concurrency=1).take_all()
        assert abs(out[0]["rms"] - 100.0) < 1e-9
        assert abs(out[0]["zcr"] - 1.0) < 1e-9

    def test_compressed_video_raises(self):
        from geomesa_ray.stages.image_ops import FrameSample

        t = pa.table({
            "image_id": pa.array(["v1"]), "bytes": pa.array([b"xx"], pa.binary()),
            "w": pa.array([2], pa.int32()), "h": pa.array([2], pa.int32()),
            "fmt": pa.array(["mp4"]),
        })
        with pytest.raises(NotImplementedError):
            FrameSample()(t)


class TestDedupClusters:
    def test_connected_components(self, ray_session):
        import ray.data

        from geomesa_ray.stages.dedup import dedup_clusters

        pairs = pa.table({
            "doc_id_a": pa.array([1, 2, 10, 11], pa.int64()),
            "doc_id_b": pa.array([2, 3, 11, 12], pa.int64()),
        })
        out = {r["doc_id"]: r["cluster_id"]
               for r in dedup_clusters(ray.data.from_arrow(pairs)).take_all()}
        assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}

    def test_auto_threshold_routes_both_sides(self, ray_session):
        """mode='auto' picks single-task union-find below the pair
        threshold and the distributed min-label path above it — same
        assignment either way."""
        import ray.data

        from geomesa_ray.stages.dedup import dedup_clusters

        pairs = pa.table({
            "doc_id_a": pa.array([1, 2, 10, 11, 20], pa.int64()),
            "doc_id_b": pa.array([2, 3, 11, 12, 21], pa.int64()),
        })
        want = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
        # below threshold -> single path
        low = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(
            ray.data.from_arrow(pairs), threshold=100).take_all()}
        # above threshold (5 pairs > 2) -> distributed path
        high = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(
            ray.data.from_arrow(pairs), threshold=2).take_all()}
        assert low == want and high == want
        with pytest.raises(ValueError):
            dedup_clusters(ray.data.from_arrow(pairs), mode="bogus")


class TestHLL:
    def test_accuracy_vs_exact(self, ray_session):
        import duckdb

        from geomesa_ray.stages.sketches import approx_distinct

        for table, col in [("events", "user_id"), ("lineitem", "l_partkey"),
                           ("orders", "o_custkey")]:
            got = approx_distinct(SF, table=table, col=col).take_all()[0][
                "approx_distinct"]
            exact = duckdb.sql(
                f"SELECT count(DISTINCT {col}) FROM "
                f"read_parquet('{SF}/{table}.parquet')").fetchone()[0]
            rel = abs(got - exact) / exact
            assert rel < 0.05, f"{table}.{col}: {got} vs {exact} ({rel:.3f})"

    def test_merge_equals_single_pass(self):
        import numpy as np

        from geomesa_ray.stages.sketches import hll_estimate, hll_registers
        from geomesa_ray.sources.fixtures import splitmix64

        h = splitmix64(np.arange(100000, dtype=np.uint64))
        whole = hll_registers(h, 12)
        merged = np.maximum(hll_registers(h[:50000], 12),
                            hll_registers(h[50000:], 12))
        assert (whole == merged).all()  # sketches are exactly mergeable
        assert abs(hll_estimate(whole) - 100000) / 100000 < 0.05


class TestLSHDistributedCandidates:
    def test_groupby_path_equals_gather_path(self, ray_session):
        from geomesa_ray.stages.dedup import minhash_lsh_pairs

        a = {(r["doc_id_a"], r["doc_id_b"]) for r in
             minhash_lsh_pairs(SF, candidate_stage="gather").take_all()}
        b = {(r["doc_id_a"], r["doc_id_b"]) for r in
             minhash_lsh_pairs(SF, candidate_stage="groupby").take_all()}
        assert a == b


class TestDistributedClustering:
    def test_min_label_matches_union_find(self, ray_session):
        """Iterated min-label propagation (the 10^10+-pair scale path)
        must produce the identical (doc_id, cluster_id) assignment as
        the single-task union-find."""
        import ray.data

        from geomesa_ray.stages.dedup import (
            dedup_clusters,
            dedup_clusters_distributed,
        )

        # graph shapes: a chain (pointer jumping collapses it in
        # O(log D) rounds), a star, a triangle with a tail, isolated
        # pairs. (Kept small: each round pays a fixed Ray Data
        # scheduling cost that amortizes only at real data scale.)
        edges = ([(i, i + 1) for i in range(100, 107)]            # chain
                 + [(200, x) for x in range(201, 206)]            # star
                 + [(300, 301), (301, 302), (302, 300), (302, 303)]
                 + [(400, 401), (500, 501)])
        pairs = ray.data.from_items(
            [{"doc_id_a": a, "doc_id_b": b} for a, b in edges])
        want = {(r["doc_id"], r["cluster_id"])
                for r in dedup_clusters(pairs).take_all()}
        got = {(r["doc_id"], r["cluster_id"])
               for r in dedup_clusters_distributed(pairs,
                                                   n_parts=8).take_all()}
        assert got == want
        # sanity: chain collapses to min label 100
        assert (106, 100) in got


class TestTopK:
    """Heavy hitters: exact distributed top-k cross-checked against
    DuckDB, and the mergeable Misra-Gries sketch's bounds + top-k
    agreement on skewed data."""

    def test_topk_values_matches_duckdb(self, ray_session):
        import duckdb

        from geomesa_ray.stages.sketches import topk_values

        got = topk_values(SF, "events", "event_type", k=3).take_all()
        want = duckdb.sql(
            "SELECT event_type, count(*)::BIGINT cnt FROM "
            f"read_parquet('{SF}/events.parquet') GROUP BY event_type "
            "ORDER BY cnt DESC, event_type LIMIT 3").fetchall()
        assert [(r["event_type"], r["cnt"]) for r in got] == want

    def test_topk_words_matches_duckdb(self, ray_session):
        import duckdb

        from geomesa_ray.stages.sketches import topk_words

        got = topk_words(SF, k=10).take_all()
        want = duckdb.sql(
            "SELECT word, count(*)::BIGINT cnt FROM ("
            "  SELECT unnest(string_split(text, ' ')) AS word FROM "
            f" read_parquet('{SF}/documents.parquet')) "
            "WHERE word <> '' GROUP BY word "
            "ORDER BY cnt DESC, word LIMIT 10").fetchall()
        assert [(r["word"], r["cnt"]) for r in got] == want

    def _zipf_dir(self, tmp_path):
        """Skewed corpus: value i appears ~40000/i times, 5000
        distinct values (> the sketch's m), deterministic."""
        import pyarrow.parquet as _pq

        from geomesa_ray.sources.fixtures import splitmix64

        reps = (40000 // np.arange(1, 5001)).clip(min=1)
        vals = np.repeat(np.arange(1, 5001), reps)
        # deterministic shuffle so batches see mixed values
        order = np.argsort(splitmix64(np.arange(len(vals), dtype=np.int64)
                                      .view(np.uint64)))
        t = pa.table({"v": pa.array(
            np.char.add("val", vals[order].astype("U6")))})
        d = tmp_path / "zipf"
        d.mkdir()
        _pq.write_table(t, str(d / "zipf.parquet"), row_group_size=20000)
        return str(d), t

    def test_sketch_bounds_and_topk_agree(self, ray_session, tmp_path):
        import collections

        from geomesa_ray.stages.sketches import topk_sketch

        d, t = self._zipf_dir(tmp_path)
        exact = collections.Counter(t.column("v").to_pylist())
        got = topk_sketch(d, "zipf", "v", k=10, m=1024).take_all()
        assert len(got) == 10
        for r in got:
            true = exact[r["v"]]
            assert r["est"] <= true <= r["est_hi"], r
        want_top = [v for v, _ in sorted(
            exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]]
        assert [r["v"] for r in got] == want_top

    def test_sketch_summary_is_capped(self, ray_session, tmp_path):
        """No partial ships more than m+1 rows regardless of distinct
        count — the property that makes the op safe at any scale."""
        from geomesa_ray.stages.sketches import _mg_truncate

        t = pa.table({"v": pa.array([f"x{i}" for i in range(5000)]),
                      "cnt": pa.array(
                          (np.arange(5000) % 97 + 1).astype(np.int64))})
        out, err = _mg_truncate(t, "v", 256)
        assert out.num_rows <= 256 and err > 0
        # every surviving counter shrank by exactly err
        survivors = {r["v"]: r["cnt"] for r in out.to_pylist()}
        orig = {r["v"]: r["cnt"] for r in t.to_pylist()}
        assert all(orig[v] - c == err for v, c in survivors.items())


class TestTopkSketchNulls:
    def test_null_heavy_hitter_reported(self, ray_session, tmp_path):
        """A null column value is a REAL counter (the exact op reports
        the null group), not Misra-Gries error mass (review finding:
        nulls vanished from the sketch and inflated every bound)."""
        import pyarrow.parquet as pq

        from geomesa_ray.stages.sketches import topk_sketch

        n = 10000
        vals = [None if i % 5 < 2 else f"v{i % 7}" for i in range(n)]
        d = tmp_path / "sk"
        d.mkdir()
        pq.write_table(pa.table({"v": pa.array(vals, pa.string())}),
                       str(d / "events.parquet"))
        got = topk_sketch(str(d), "events", "v", k=3, m=512).take_all()
        # null is 40% of rows -> rank 1, exactly counted (m >> distinct)
        assert got[0]["v"] is None
        assert got[0]["est"] == 4000
        assert got[0]["est_hi"] == 4000


class TestRepetitionFilters:
    """Gopher-style repetition metrics vs an independent tuple-based
    oracle (Counter over real token tuples, no hashing)."""

    def _oracle(self, text, top_n=2, dup_n=5):
        from collections import Counter

        toks = text.split()
        t = len(toks)

        def grams(n):
            return [tuple(toks[i:i + n]) for i in range(t - n + 1)]

        top = Counter(grams(top_n)).most_common(1)
        top_frac = (top[0][1] * top_n / max(t, 1)) if top else 0.0
        cd = Counter(grams(dup_n))
        dup_tok = sum(c * dup_n for c in cd.values() if c > 1)
        return top_frac, min(dup_tok / max(t, 1), 1.0)

    def test_repetition_batch_oracle(self):
        from geomesa_ray.stages.text_ops import repetition_batch

        texts = [
            "a b a b a b a b a b",            # pure 2-gram repetition
            "x y z w v u t s r q",            # no repetition
            "one two three one two three one two three end",
            "short",
            "",
            "p q r s t p q r s t p q r s t",  # repeated 5-gram
        ]
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        out = repetition_batch(t)
        for i, txt in enumerate(texts):
            top, dup = self._oracle(txt)
            assert abs(out.column("top_ngram_frac")[i].as_py() - top) \
                < 1e-12, (i, txt)
            assert abs(out.column("dup_ngram_frac")[i].as_py() - dup) \
                < 1e-12, (i, txt)

    def test_repetition_on_corpus(self, ray_session):
        """Every fixture doc's metrics match the tuple oracle."""
        from geomesa_ray.stages.text_ops import repetition_metrics

        rows = {r["doc_id"]: r for r in repetition_metrics(SF).take_all()}
        t = docs_table()
        for d, txt in list(zip(t.column("doc_id").to_pylist(),
                               t.column("text").to_pylist()))[:100]:
            top, dup = self._oracle(txt)
            assert abs(rows[d]["top_ngram_frac"] - top) < 1e-12
            assert abs(rows[d]["dup_ngram_frac"] - dup) < 1e-12
            assert rows[d]["n_tokens"] == len(txt.split())

    def test_quality_filter_reasons(self, ray_session, tmp_path):
        import pyarrow.parquet as _pq

        from geomesa_ray.stages.text_ops import quality_filter

        texts = {
            10: "a b " * 50,                       # top-2-gram repetition
            11: " ".join(f"w{i}" for i in range(40)),  # clean
            12: "tiny doc",                        # too short
            13: " ".join(["x" * 40] * 20),         # absurd token length
        }
        d = tmp_path / "qf"
        d.mkdir()
        _pq.write_table(pa.table({
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string())}),
            str(d / "documents.parquet"))
        got = {r["doc_id"]: (r["keep"], r["reason"])
               for r in quality_filter(str(d)).take_all()}
        assert got[11] == (True, "")
        assert got[10] == (False, "top_2gram_repetition")
        assert got[12] == (False, "too_short")
        assert got[13] == (False, "mean_token_len")

    def test_contamination(self, ray_session, tmp_path):
        import pyarrow.parquet as _pq

        from geomesa_ray.stages.text_ops import contamination

        bench = "the quick brown fox jumps over the lazy dog today"
        clean = " ".join(f"c{i}" for i in range(30))
        # doc 1 embeds an 8-gram of the benchmark verbatim
        dirty = "prefix words " + " ".join(bench.split()[:8]) + " suffix"
        d = tmp_path / "ct"
        d.mkdir()
        _pq.write_table(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([dirty, clean], pa.string())}),
            str(d / "documents.parquet"))
        got = {r["doc_id"]: (r["contaminated"], r["contaminated_ngrams"])
               for r in contamination(str(d), [bench], n=8).take_all()}
        assert got[1][0] is True and got[1][1] == 1
        assert got[2] == (False, 0)


class TestStatsSketches:
    def test_descriptive_stats_oracle(self, ray_session):
        """Chan-merged moments vs numpy population stats over the
        images fixture lon/lat (float) + phash (int)."""
        import pyarrow.parquet as _pq

        from geomesa_ray.sources import ensure_fixtures
        from geomesa_ray.stages.sketches import descriptive_stats

        fdir = ensure_fixtures(SF)
        t = _pq.read_table(f"{fdir}/images.parquet", columns=["phash"])
        out = descriptive_stats(fdir, "images", ["phash"]).take_all()
        row = out[0]
        x = t.column("phash").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        assert row["n"] == len(x)
        assert abs(row["mean"] - x.mean()) < abs(x.mean()) * 1e-12 + 1e-9
        assert abs(row["variance"] - x.var()) <= x.var() * 1e-9
        assert row["min"] == x.min() and row["max"] == x.max()

    def test_frequency_sketch_bounds(self, ray_session, tmp_path):
        """CM estimates never undercount; with width >> distincts they
        are exact; the distributed merge equals a single-pass sketch
        (linearity)."""
        import collections

        import pyarrow.parquet as _pq

        from geomesa_ray.stages.sketches import (_hash_column, cms_query,
                                                 cms_update,
                                                 frequency_sketch)

        n = 50000
        vals = (np.arange(n) * 7919 % 40).astype(np.int64)  # 40 distincts
        d = tmp_path / "cms"
        d.mkdir()
        _pq.write_table(pa.table({"v": pa.array(vals)}),
                        str(d / "events.parquet"), row_group_size=8192)
        m = frequency_sketch(str(d), "events", "v", depth=4, width=2048)
        true = collections.Counter(vals.tolist())
        q = np.unique(vals)
        est = cms_query(m, _hash_column(pa.array(q)).view(np.int64))
        assert all(e >= true[v] for v, e in zip(q, est))
        assert all(e == true[v] for v, e in zip(q, est))  # sparse: exact
        # linearity vs one local sketch of the whole column
        local = cms_update(_hash_column(pa.array(vals)).view(np.int64),
                           depth=4, width=2048)
        assert np.array_equal(m, local)


class TestZ3Histogram:
    def test_matches_duckdb_z3_twin(self, ray_session):
        """z3_histogram vs the shared z3 SQL twin: DuckDB computes the
        same (week, z3 >> shift) counts from the same parquet."""
        import duckdb

        from geomesa_ray.oracle_gen import z3_encode_sql
        from geomesa_ray.pipelines.density import z3_histogram
        from geomesa_ray.sources import ensure_fixtures

        fdir = ensure_fixtures(SF)
        got = {(r["week"], r["z3_prefix"]): r["cnt"]
               for r in z3_histogram(fdir, prefix_bits=12).take_all()}
        inner = z3_encode_sql(
            f"read_parquet('{fdir}/images*.parquet')")
        sql = (f"SELECT week, z3 >> 51 AS z3_prefix, COUNT(*) AS cnt "
               f"FROM ({inner}) GROUP BY 1, 2")
        want = {(int(w), int(p)): int(c)
                for w, p, c in duckdb.sql(sql).fetchall()}
        assert got == want and sum(got.values()) == 6000


class TestQuantileSketch:
    @staticmethod
    def _rank_err(sorted_data, qs, est):
        """Tie-aware rank error: distance from q to the value's rank
        INTERVAL [left, right) — a heavy duplicate legitimately spans
        many ranks."""
        n = len(sorted_data)
        errs = []
        for q, e in zip(qs, est):
            lo = np.searchsorted(sorted_data, e, "left") / n
            hi = np.searchsorted(sorted_data, e, "right") / n
            errs.append(max(0.0, lo - q, q - hi))
        return max(errs)

    def test_kll_bounds_and_merge(self):
        from geomesa_ray.stages.sketches import KllSketch

        rng = np.random.default_rng(0)
        qs = [0.01, 0.25, 0.5, 0.75, 0.99]
        for name, data in [
            ("uniform", rng.uniform(0, 1, 200000)),
            ("zipf", rng.zipf(1.5, 200000).astype(float)),
            ("bimodal", np.concatenate([rng.normal(0, 1, 100000),
                                        rng.normal(50, 1, 100000)])),
        ]:
            sk = KllSketch(200)
            for chunk in np.array_split(data, 37):
                sk.update_many(chunk)
            sd = np.sort(data)
            assert self._rank_err(sd, qs, sk.quantiles(qs)) < 0.02, name
            assert sum(len(lv) for lv in sk.levels) < 4000  # sublinear
            # merge of halves stays within the bound
            a, b = KllSketch(200), KllSketch(200)
            a.update_many(data[:100000])
            b.update_many(data[100000:])
            a.merge(b)
            assert a.n == len(data)
            assert self._rank_err(sd, qs, a.quantiles(qs)) < 0.02, name
            # dump/load round-trip preserves the estimate
            c = KllSketch.load(*a.dump())
            assert self._rank_err(sd, qs, c.quantiles(qs)) < 0.02, name

    def test_distributed_quantiles(self, ray_session):
        """quantile_sketch over the images phash column vs exact
        np.quantile ranks."""
        from geomesa_ray.sources import ensure_fixtures
        from geomesa_ray.stages.sketches import quantile_sketch

        fdir = ensure_fixtures(SF)
        qs = (0.1, 0.5, 0.9)
        out = quantile_sketch(fdir, "images", "phash", qs=qs).take_all()
        assert [r["q"] for r in out] == list(qs)
        assert out[0]["n"] == 6000
        import glob

        import pyarrow.parquet as _pq

        allx = np.sort(np.concatenate([
            _pq.read_table(p, columns=["phash"]).column("phash")
            .to_numpy(zero_copy_only=False).astype(np.float64)
            for p in glob.glob(f"{fdir}/images*.parquet")]))
        est = [r["value"] for r in out]
        assert self._rank_err(allx, qs, est) < 0.03


class TestQualityFilterUnicode:
    def test_nbsp_separators_not_penalized(self, ray_session, tmp_path):
        """U+00A0 separators: the Arrow splitter sees 3 tokens but an
        ASCII \\S count sees the NBSP as a character — mean token
        length must use one whitespace definition (review finding)."""
        import pyarrow.parquet as _pq

        from geomesa_ray.stages.text_ops import quality_filter

        text = " ".join(f"word{i}" for i in range(20))
        d = tmp_path / "uni"
        d.mkdir()
        _pq.write_table(pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array([text, ], pa.string())}),
            str(d / "documents.parquet"))
        (row,) = quality_filter(str(d)).take_all()
        # under RE2's ASCII whitespace this is ONE long token -> the
        # doc legitimately fails too_short, NOT mean_token_len derived
        # from mismatched token counts
        assert row["reason"] != "mean_token_len" or row["keep"] is False
        # a doc with ASCII spaces and the same words passes
        _pq.write_table(pa.table({
            "doc_id": pa.array([2], pa.int64()),
            "text": pa.array([" ".join(f"word{i}" for i in range(20))],
                             pa.string())}),
            str(d / "documents.parquet"))
        (row,) = quality_filter(str(d)).take_all()
        assert row["keep"] is True


class TestKllEmpty:
    def test_empty_and_allnull(self, ray_session, tmp_path):
        import pyarrow.parquet as _pq

        from geomesa_ray.stages.sketches import KllSketch, quantile_sketch

        assert np.all(np.isnan(KllSketch().quantiles([0.5, 0.9])))
        d = tmp_path / "qn"
        d.mkdir()
        _pq.write_table(pa.table({
            "v": pa.array([None, None], pa.float64())}),
            str(d / "events.parquet"))
        out = quantile_sketch(str(d), "events", "v", qs=(0.5,)).take_all()
        assert out[0]["n"] == 0 and (out[0]["value"] is None
                                     or np.isnan(out[0]["value"]))

    def test_cms_depth_beyond_eight(self):
        from geomesa_ray.stages.sketches import cms_query, cms_update

        vals = np.arange(1000, dtype=np.int64)
        m = cms_update(vals, depth=12, width=64)
        assert m.shape == (12, 64)
        assert (cms_query(m, vals) >= 1).all()


class TestNeardupRecallCurve:
    """Recall-vs-tau evidence for sizing ``assign`` (the IVF multi-probe
    width): a planted corpus with near-dup clusters at cos ~0.82/0.90/
    0.97 plus noise, measured at the REALISTIC near-dup taus 0.8-0.95
    (the driver fixture has no pairs above cos 0.5 — its tau=0.35
    numbers are the adversarial low end). Values are fully
    deterministic (seeded corpus, deterministic codebooks)."""

    DIM, N_CLUSTERS, N_NOISE, SEED = 64, 60, 260, 20260817

    @classmethod
    def _corpus_dir(cls, tmp_path_factory):
        import pyarrow.parquet as _pq

        rng = np.random.default_rng(cls.SEED)
        base = rng.normal(size=(cls.N_CLUSTERS, cls.DIM))
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        rows = [base]
        for s in (0.03, 0.06, 0.10):  # cos to base ~0.97 / 0.90 / 0.82
            p = base + rng.normal(size=(cls.N_CLUSTERS, cls.DIM)) * s
            rows.append(p / np.linalg.norm(p, axis=1, keepdims=True))
        noise = rng.normal(size=(cls.N_NOISE, cls.DIM))
        rows.append(noise / np.linalg.norm(noise, axis=1, keepdims=True))
        m = np.concatenate(rows)[rng.permutation(
            cls.N_CLUSTERS * 4 + cls.N_NOISE)]
        d = tmp_path_factory.mktemp("recall_corpus")
        _pq.write_table(pa.table({
            "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
            "embedding": pa.array(m.tolist(), pa.list_(pa.float64())),
        }), str(d / "embeddings.parquet"))
        return str(d), m

    @pytest.mark.parametrize("tau", [0.80, 0.85, 0.90, 0.95])
    def test_recall_curve_at_neardup_taus(self, ray_session,
                                          tmp_path_factory, tau):
        from geomesa_ray.stages.similarity import embed_neardup

        d, m = self._corpus_dir(tmp_path_factory)
        cos = m @ m.T
        iu = np.triu_indices(len(m), 1)
        want = {(int(i), int(j)) for i, j in zip(*iu) if cos[i, j] >= tau}
        assert want  # the planted structure reaches this tau
        curve = {}
        for cb in ("first", "kmeans"):
            for assign in (1, 2, 4):
                rows = embed_neardup(d, tau=tau, n_centroids=16,
                                     assign=assign, codebook=cb).take_all()
                got = [(r["vec_id_a"], r["vec_id_b"]) for r in rows]
                assert set(got) <= want, (cb, assign)  # no false positive
                assert len(got) == len(set(got)), (cb, assign)  # once
                curve[(cb, assign)] = len(got) / len(want)
        print(f"recall tau={tau}: " + "  ".join(
            f"{cb}/assign={a}:{r:.3f}" for (cb, a), r in curve.items()))
        # measured floors (deterministic; see embed_neardup docstring)
        assert curve[("first", 4)] == 1.0
        assert curve[("kmeans", 2)] == 1.0
        assert curve[("kmeans", 1)] >= 0.99
        assert curve[("first", 2)] >= 0.93
        # recall is monotone in assign for both codebooks
        for cb in ("first", "kmeans"):
            assert curve[(cb, 1)] <= curve[(cb, 2)] <= curve[(cb, 4)]
