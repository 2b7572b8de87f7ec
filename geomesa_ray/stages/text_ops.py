"""Text-analysis stages over the documents table.

Large-scale training-data ops (beyond the reference's surface, mandated by
the build spec): token counting, quality scoring, language-ID heuristic,
document fingerprinting. All per-batch vectorized: pyarrow.compute regex
kernels (RE2 — same engine DuckDB uses, so counts match the SQL oracle)
or hashlib for fingerprints.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from geomesa_ray.sources.io import read_table

TOKEN_RE = r"\S+"
NONSPACE_RE = r"\S"


def token_count_batch(batch: pa.Table) -> pa.Table:
    n_tok = pc.count_substring_regex(batch.column("text"), TOKEN_RE).cast(pa.int64())
    return pa.table({"doc_id": batch.column("doc_id"), "n_tokens": n_tok})


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality signals: char count, token count, mean token length.

    mean_token_len is CAST(nonspace AS DOUBLE)/CAST(tokens AS DOUBLE) —
    mirrored in the SQL oracle.
    """
    text = batch.column("text")
    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_tok = pc.count_substring_regex(text, TOKEN_RE).cast(pa.int64())
    n_ns = pc.count_substring_regex(text, NONSPACE_RE).cast(pa.int64())
    tok = n_tok.to_numpy(zero_copy_only=False).astype(np.float64)
    ns = n_ns.to_numpy(zero_copy_only=False).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_len = np.where(tok > 0, ns / tok, 0.0)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_token_len": pa.array(mean_len),
    })


# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "that"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es"},
    "fr": {"le", "la", "de", "et", "un", "que", "pour", "dans"},
    "de": {"der", "die", "das", "und", "ist", "in", "von", "mit"},
}


class LangIdStage:
    """Actor-pool stage: stopword profiles loaded (and hashed) once per
    actor (the reference's per-executor cache pattern,
    GeoMesaSpark.scala:170-202).

    Fully vectorized scoring: one RE2 split over the whole column, one
    polynomial-hash pass over the flattened token buffer
    (``sketches._hash_string_array`` — the same kernel the dedup path
    uses), ``np.isin`` against each language's hashed stopword set, and
    per-doc sums via a cumsum difference over the list offsets. No
    per-row / per-token Python anywhere."""

    def __init__(self):
        from geomesa_ray.stages.sketches import _hash_string_array

        self.langs = sorted(_LANG_PROFILES)
        self.lang_arr = np.array(self.langs)
        self.profile_hashes = [
            _hash_string_array(pa.array(sorted(_LANG_PROFILES[k]),
                                        pa.string()))
            for k in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from geomesa_ray.stages.sketches import _hash_string_array

        # tokenize with RE2 \s+ on the lowered column — the same engine
        # and token stream the SQL oracle's regexp_extract_all('\S+')
        # produces (Python str.split disagrees with RE2 on non-ASCII
        # whitespace like U+00A0)
        low = pc.utf8_lower(batch.column("text"))
        if isinstance(low, pa.ChunkedArray):
            low = low.combine_chunks()
        toks = pc.split_pattern_regex(low, pattern=r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        flat = pc.list_flatten(toks)
        if len(flat):
            # the RE2 split emits empty boundary tokens at leading /
            # trailing whitespace — drop them from the stream and
            # remap the offsets through the keep-cumsum
            keep = pc.greater(pc.utf8_length(flat), 0) \
                .to_numpy(zero_copy_only=False)
            kc = np.concatenate([np.zeros(1, np.int64),
                                 np.cumsum(keep.astype(np.int64))])
            h = _hash_string_array(flat.combine_chunks()
                                   if isinstance(flat, pa.ChunkedArray)
                                   else flat)[keep]
            offs = kc[offs]
        else:
            h = np.empty(0, dtype=np.uint64)
        ndocs = batch.num_rows
        n_tok = offs[1:] - offs[:-1]
        scores = np.zeros((len(self.langs), ndocs), dtype=np.int64)
        for i, ph in enumerate(self.profile_hashes):
            hit = np.isin(h, ph)
            c = np.concatenate([np.zeros(1, np.int64),
                                np.cumsum(hit.astype(np.int64))])
            scores[i] = c[offs[1:]] - c[offs[:-1]]
        # np.argmax takes the FIRST maximum — identical to the scalar
        # path's max(sorted(scores)) first-in-sorted-order tie-break
        best_idx = np.argmax(scores, axis=0)
        sbest = scores[best_idx, np.arange(ndocs)]
        pred = np.where((n_tok > 0) & (sbest > 0),
                        self.lang_arr[best_idx], "und")
        with np.errstate(divide="ignore", invalid="ignore"):
            conf = np.where(n_tok > 0,
                            sbest / np.maximum(n_tok, 1).astype(np.float64),
                            0.0)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(pred, pa.string()),
            "lang_conf": pa.array(conf, pa.float64()),
        })


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Content fingerprint (md5 hex — byte-compatible with DuckDB md5())."""
    fps = [hashlib.md5(t.encode("utf-8")).hexdigest()
           for t in batch.column("text").to_pylist()]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "fp": pa.array(fps, pa.string())})


def token_counts(sf_dir: str) -> ray.data.Dataset:
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow")


# GPT-2-flavoured pre-tokenizer, restricted to the RE2 subset (no
# lookahead): contractions, letter runs, digit runs, punctuation runs,
# whitespace runs — each with the optional leading space
BPE_TOKEN_RE = (r"'(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+"
                r"| ?[^\s\p{L}\p{N}]+|\s+")


def bpe_token_counts(sf_dir: str) -> ray.data.Dataset:
    """LLM-style token estimate: count of BPE pre-tokenizer matches
    (the training-data budget proxy). pyarrow and DuckDB both run RE2,
    so the SQL oracle's regexp_extract_all length matches exactly."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def count(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column("text"),
                                     BPE_TOKEN_RE).cast(pa.int64())
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_bpe_tokens": n})

    return ds.map_batches(count, batch_format="pyarrow")


def text_quality(sf_dir: str) -> ray.data.Dataset:
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(quality_batch, batch_format="pyarrow")


def lang_id(sf_dir: str) -> ray.data.Dataset:
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(LangIdStage, batch_format="pyarrow", concurrency=(1, 4))


def fingerprints(sf_dir: str) -> ray.data.Dataset:
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------
# Repetition / contamination filters (Gopher-style, Rae et al. 2021
# section A1.1) — the standard training-data curation metrics, fully
# vectorized over whole batches via the dedup tokenization machinery
# (one Arrow split + one polynomial-hash pass; no per-token Python).


def _pos_mults(n: int) -> np.ndarray:
    """n DISTINCT odd position multipliers. The 3-cycle multipliers the
    shingle path uses would hash token swaps at distance 3 identically
    (XOR is commutative); repetition metrics need position-exact
    n-grams, so every window position gets its own multiplier."""
    from geomesa_ray.sources.fixtures import splitmix64

    return (splitmix64(np.arange(1, n + 1, dtype=np.int64)
                       .view(np.uint64)) | np.uint64(1))


def _ngram_doc_hashes(th: np.ndarray, offs: np.ndarray, n: int):
    """Positional n-gram hashes for a FLAT token-hash buffer with doc
    offsets. Returns (flat int64 hashes in document order, the doc
    index of each n-gram). A doc with t tokens has max(t - n + 1, 0)
    n-grams; windows never cross doc boundaries."""
    from geomesa_ray.sources.fixtures import splitmix64

    total = int(offs[-1])
    if total < n:
        return (np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64))
    starts = np.arange(total - n + 1, dtype=np.int64)
    doc_of = np.searchsorted(offs, starts, side="right") - 1
    valid = starts + n <= offs[doc_of + 1]
    starts = starts[valid]
    doc_of = doc_of[valid]
    u = th.view(np.uint64)
    mults = _pos_mults(n)
    with np.errstate(over="ignore"):
        mixed = np.zeros(len(starts), dtype=np.uint64)
        for j in range(n):
            mixed ^= u[starts + j] * mults[j]
    return splitmix64(mixed).view(np.int64), doc_of


def repetition_batch(batch: pa.Table, top_n: int = 2,
                     dup_n: int = 5) -> pa.Table:
    """Per-doc repetition metrics:

    - ``top_ngram_frac``: tokens covered by the single most frequent
      ``top_n``-gram / total tokens (Gopher: drop if top-2-gram > 0.20)
    - ``dup_ngram_frac``: tokens inside ``dup_n``-grams occurring more
      than once / total tokens, capped at 1 (overlapping windows can
      cover more token-slots than the doc has tokens)
    """
    from geomesa_ray.stages.dedup import _ws_token_hashes

    th, offs = _ws_token_hashes(batch.column("text"))
    ndocs = batch.num_rows
    n_tokens = np.diff(offs)

    def per_doc_stats(n, want):
        """Per-doc n-gram run statistic: ``want="top"`` -> longest run
        (most frequent n-gram count); ``want="dup"`` -> tokens covered
        by runs longer than 1. Only the requested scatter pass runs."""
        out = np.zeros(ndocs, dtype=np.int64)
        g, doc_of = _ngram_doc_hashes(th, offs, n)
        if len(g) == 0:
            return out
        order = np.lexsort((g, doc_of))
        gs, ds_ = g[order], doc_of[order]
        new = np.concatenate(([True], (gs[1:] != gs[:-1])
                              | (ds_[1:] != ds_[:-1])))
        run_start = np.nonzero(new)[0]
        run_len = np.diff(np.concatenate([run_start, [len(gs)]]))
        run_doc = ds_[run_start]
        if want == "top":
            np.maximum.at(out, run_doc, run_len)
        else:
            dmask = run_len > 1
            np.add.at(out, run_doc[dmask], run_len[dmask] * n)
        return out

    top_run = per_doc_stats(top_n, "top")
    dup_tok = per_doc_stats(dup_n, "dup")
    denom = np.maximum(n_tokens, 1).astype(np.float64)
    top_frac = (top_run * top_n) / denom
    # a doc shorter than top_n has no n-gram: fraction 0, not 1/t
    top_frac[n_tokens < top_n] = 0.0
    dup_frac = np.minimum(dup_tok / denom, 1.0)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n_tokens),
        "top_ngram_frac": pa.array(top_frac),
        "dup_ngram_frac": pa.array(dup_frac),
    })


def repetition_metrics(sf_dir: str, top_n: int = 2,
                       dup_n: int = 5) -> ray.data.Dataset:
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: repetition_batch(b, top_n=top_n, dup_n=dup_n),
        batch_format="pyarrow")


def quality_filter(sf_dir: str, max_top2_frac: float = 0.20,
                   max_dup5_frac: float = 0.30, min_tokens: int = 10,
                   max_mean_token_len: float = 12.0) -> ray.data.Dataset:
    """Gopher-style keep/drop decision per document, with the FIRST
    failing rule as the reason (empty reason = kept). One fused batch
    pass — repetition + length + token-shape rules share the tokenize."""

    def decide(batch: pa.Table) -> pa.Table:
        rep = repetition_batch(batch)
        n_tok = rep.column("n_tokens").to_numpy(zero_copy_only=False)
        top2 = rep.column("top_ngram_frac").to_numpy(zero_copy_only=False)
        dup5 = rep.column("dup_ngram_frac").to_numpy(zero_copy_only=False)
        # mean token length uses ONE whitespace definition — the same
        # Arrow Unicode splitter the tokenizer uses. Mixing its token
        # count with an ASCII \S char count would see U+00A0-style
        # separators as token characters and wrongly drop web-scraped
        # docs for "long tokens": char count = per-doc sum of the
        # SPLIT tokens' lengths.
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.utf8_split_whitespace(text)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat_len = pc.utf8_length(pc.list_flatten(toks)) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(flat_len)])
        base = offs - offs[0]
        n_ns = (cum[base[1:]] - cum[base[:-1]]).astype(np.float64)
        mean_len = n_ns / np.maximum(n_tok, 1)
        reason = np.full(len(n_tok), "", dtype=object)
        for name, bad in [
            ("too_short", n_tok < min_tokens),
            ("mean_token_len", mean_len > max_mean_token_len),
            ("top_2gram_repetition", top2 > max_top2_frac),
            ("dup_5gram_repetition", dup5 > max_dup5_frac),
        ]:
            reason[(reason == "") & bad] = name
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "keep": pa.array(reason == ""),
            "reason": pa.array(reason, pa.string()),
        })

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(decide, batch_format="pyarrow")


def contamination(sf_dir: str, probe_texts: list[str],
                  n: int = 8) -> ray.data.Dataset:
    """Benchmark-contamination check: flag documents sharing any word
    ``n``-gram with the probe texts (the standard eval-decontamination
    op). The probe n-gram set is hashed ONCE on the driver (benchmarks
    are tiny), broadcast via ray.put, and resolved once per worker;
    each batch counts membership hits with a vectorized searchsorted —
    the corpus side never leaves its workers."""
    import ray as _ray

    from geomesa_ray.stages.dedup import _ws_token_hashes
    from geomesa_ray.util import resolve_broadcast

    pth, poffs = _ws_token_hashes(pa.array(probe_texts, pa.string()))
    pg, _ = _ngram_doc_hashes(pth, poffs, n)
    probe_ref = _ray.put(np.unique(pg))

    def check(batch: pa.Table) -> pa.Table:
        from geomesa_ray.util import sorted_membership

        probes = resolve_broadcast(probe_ref)
        th, offs = _ws_token_hashes(batch.column("text"))
        g, doc_of = _ngram_doc_hashes(th, offs, n)
        hit = sorted_membership(g, probes)
        hits = np.bincount(doc_of[hit], minlength=batch.num_rows) \
            .astype(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "contaminated_ngrams": pa.array(hits),
            "contaminated": pa.array(hits > 0),
        })

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(check, batch_format="pyarrow")
