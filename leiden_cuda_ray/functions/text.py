"""Text analysis operators over a documents table (north-rule training-data
ops; no reference analogue — the reference's only string handling is the
edge-list parser, SURVEY.md §2.7).

All stages are stateless vectorized `map_batches` over zero-copy Arrow
batches using pyarrow.compute regex kernels — no per-row Python in the token
counting / punctuation paths. Regex patterns are module-level constants
(compiled once per worker process).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# language-ID stopword profiles (tiny n-gram/stopword heuristic)
_LANG_PATTERNS = {
    "en": r"\b(the|and|of|to|in|is|that|for|with|was)\b",
    "de": r"\b(der|die|das|und|ist|nicht|von|mit|den|ein)\b",
    "fr": r"\b(le|la|les|et|est|pas|des|une|dans|pour)\b",
    "es": r"\b(el|la|los|las|es|y|de|que|en|por)\b",
}
_CJK = r"[一-鿿]"
_PUNCT = r"[.,;:!?]"
_TOKEN = r"\S+"


def _stats_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        "n_tokens": pc.cast(pc.count_substring_regex(text, _TOKEN),
                            pa.int64()),
        "n_punct": pc.cast(pc.count_substring_regex(text, _PUNCT),
                           pa.int64()),
    })


def token_stats(ds):
    """documents → (doc_id, n_chars, n_tokens, n_punct). SQL-oracle-able."""
    return ds.select_columns(["doc_id", "text"]).map_batches(
        _stats_batch, batch_format="pyarrow", zero_copy_batch=True)


def _lang_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    n_tok = np.maximum(
        np.asarray(pc.count_substring_regex(text, _TOKEN)), 1)
    scores = []
    langs = []
    for lang, pat in _LANG_PATTERNS.items():
        langs.append(lang)
        scores.append(np.asarray(pc.count_substring_regex(text, pat))
                      / n_tok)
    score_mat = np.stack(scores)          # (n_langs, n_rows)
    best = np.argmax(score_mat, axis=0)
    best_score = score_mat[best, np.arange(score_mat.shape[1])]
    pred = np.array(langs, dtype=object)[best]
    pred[best_score == 0] = "unknown"
    cjk = np.asarray(pc.count_substring_regex(text, _CJK)) > 0
    pred[cjk] = "zh"
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "lang_pred": pa.array(pred, pa.string()),
        "lang_score": pa.array(best_score, pa.float64()),
    })


def language_id(ds):
    """documents → (doc_id, lang_pred, lang_score) via stopword profiles."""
    return ds.select_columns(["doc_id", "text"]).map_batches(
        _lang_batch, batch_format="pyarrow", zero_copy_batch=True)


def _quality_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    n_chars = np.asarray(pc.utf8_length(text), dtype=np.float64)
    n_tok = np.asarray(pc.count_substring_regex(text, _TOKEN),
                       dtype=np.float64)
    n_punct = np.asarray(pc.count_substring_regex(text, _PUNCT),
                         dtype=np.float64)
    n_stop = np.asarray(pc.count_substring_regex(
        text, _LANG_PATTERNS["en"]), dtype=np.float64)
    safe_tok = np.maximum(n_tok, 1.0)
    mean_tok_len = np.where(n_tok > 0, (n_chars - (n_tok - 1)) / safe_tok, 0)
    stop_ratio = n_stop / safe_tok
    punct_ratio = n_punct / np.maximum(n_chars, 1.0)
    # simple composite: reasonable length, some stopwords, sane punctuation
    length_term = np.clip(n_tok / 100.0, 0, 1)
    score = (0.4 * length_term + 0.4 * np.clip(stop_ratio * 5, 0, 1)
             + 0.2 * (1.0 - np.clip(punct_ratio * 10, 0, 1)))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "quality": pa.array(score, pa.float64()),
        "stop_ratio": pa.array(stop_ratio, pa.float64()),
        "punct_ratio": pa.array(punct_ratio, pa.float64()),
        "mean_token_len": pa.array(mean_tok_len, pa.float64()),
    })


def quality_score(ds):
    """documents → (doc_id, quality, stop_ratio, punct_ratio, mean_token_len)."""
    return ds.select_columns(["doc_id", "text"]).map_batches(
        _quality_batch, batch_format="pyarrow", zero_copy_batch=True)


_FP_WINDOW = 8
_FP_BASE = np.uint64(1099511628211)


def _doc_fingerprint(text: str) -> int:
    """Winnowing-style fingerprint: min rolling hash over token windows."""
    toks = text.split()
    if not toks:
        return 0
    h = np.array([int.from_bytes(
        hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
        for t in toks], dtype=np.uint64)
    if len(h) < _FP_WINDOW:
        acc = np.uint64(0)
        for x in h:
            acc = acc * _FP_BASE + x
        return int(acc)
    # rolling window hash: sum of token hashes times position weights
    w = _FP_BASE ** np.arange(_FP_WINDOW, dtype=np.uint64)
    windows = np.lib.stride_tricks.sliding_window_view(h, _FP_WINDOW)
    wh = (windows * w).sum(axis=1, dtype=np.uint64)
    return int(wh.min())


def _fp_batch(batch: pa.Table) -> pa.Table:
    fps = [_doc_fingerprint(t) for t in batch.column("text").to_pylist()]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fingerprint": pa.array(np.array(fps, np.uint64).astype(np.int64),
                                pa.int64()),
    })


def fingerprints(ds):
    """documents → (doc_id, fingerprint) rolling-hash document fingerprint."""
    return ds.select_columns(["doc_id", "text"]).map_batches(
        _fp_batch, batch_format="pyarrow", zero_copy_batch=True)
