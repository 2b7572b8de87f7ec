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
    """Actor-pool stage: stopword profiles loaded once per actor
    (the reference's per-executor cache pattern,
    GeoMesaSpark.scala:170-202)."""

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        # tokenize with RE2 \S+ on the lowered column — the same engine
        # and pattern the SQL oracle uses (Python str.split disagrees
        # with RE2 on non-ASCII whitespace like U+00A0)
        low = pc.utf8_lower(batch.column("text"))
        tok_lists = pc.split_pattern_regex(low, pattern=r"\s+")
        if isinstance(tok_lists, pa.ChunkedArray):
            tok_lists = tok_lists.combine_chunks()
        preds, confs = [], []
        for toks in tok_lists.to_pylist():
            toks = [t for t in toks if t]
            if not toks:
                preds.append("und")
                confs.append(0.0)
                continue
            scores = {k: sum(1 for w in toks if w in p)
                      for k, p in self.profiles.items()}
            best = max(sorted(scores), key=lambda k: scores[k])
            preds.append(best if scores[best] > 0 else "und")
            confs.append(scores[best] / len(toks))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(preds, pa.string()),
            "lang_conf": pa.array(confs, pa.float64()),
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
