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

from leiden_cuda_ray.functions.arrowutil import int_bincount
import ray

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


#: GPT-2-style pre-tokenizer shape: contraction suffixes, space-prefixed
#: letter runs, digit runs, other-symbol runs, residual whitespace. Both
#: Arrow and DuckDB compile this with RE2, so counts agree exactly.
_BPE_TOKEN = (r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+"
              r"| ?[^A-Za-z0-9\s]+|\s+")


def bpe_token_count(ds):
    """documents → (doc_id, n_chars, n_bpe_tokens): token counts under a
    BPE-ish regex pre-tokenizer (the training-cost estimator shape) —
    one vectorized RE2 count per batch, no per-row Python."""
    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_bpe_tokens": pc.cast(
                pc.count_substring_regex(text, _BPE_TOKEN), pa.int64()),
        })

    return ds.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)


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
    """Vectorized winnowing fingerprint, bit-identical to
    _doc_fingerprint: one pyarrow tokenize per batch, blake2b once per
    DISTINCT token (the simhash dictionary-hash pattern), then modular
    uint64 window hashes over the flat token stream with doc-boundary
    masking — no per-doc or per-token Python loop."""
    text = batch.column("text")
    nrows = len(text)
    toks = pc.split_pattern_regex(text, r"\s+")
    flat = pc.list_flatten(toks)
    par_arr = pc.list_parent_indices(toks)
    mask = pc.not_equal(flat, "")
    flat = flat.filter(mask)
    par = np.asarray(par_arr.filter(mask), np.int64)

    denc = flat.combine_chunks().dictionary_encode() \
        if isinstance(flat, pa.ChunkedArray) else flat.dictionary_encode()
    vocab_h = np.fromiter(
        (int.from_bytes(hashlib.blake2b(w.encode(),
                                        digest_size=8).digest(), "big")
         for w in denc.dictionary.to_pylist()),
        dtype=np.uint64, count=len(denc.dictionary))
    h = vocab_h[np.asarray(denc.indices, np.int64)] if len(vocab_h) \
        else np.empty(0, np.uint64)

    n = np.bincount(par, minlength=nrows).astype(np.int64)
    ends = np.cumsum(n)
    fp = np.zeros(nrows, np.uint64)

    # short docs (0 < n < W): Horner poly hash Σ h_j · B^(n-1-j)
    W = _FP_WINDOW
    # array op: uint64 wraparound is the intended modular arithmetic
    # (scalar numpy ops would warn on overflow)
    powers = _FP_BASE ** np.arange(W, dtype=np.uint64)
    short = (n > 0) & (n < W)
    if short.any():
        pos_in_doc = np.arange(len(h), dtype=np.int64) - (ends - n)[par]
        sel = short[par]
        exp = (n[par] - 1 - pos_in_doc)[sel]
        acc = np.zeros(nrows, np.uint64)
        np.add.at(acc, par[sel], h[sel] * powers[exp])
        fp[short] = acc[short]

    # long docs (n ≥ W): min over window hashes Σ_j h[p+j]·B^j,
    # windows masked to stay inside one doc
    if len(h) >= W and (n >= W).any():
        wexp = powers[:W]
        windows = np.lib.stride_tricks.sliding_window_view(h, W)
        wh = (windows * wexp).sum(axis=1, dtype=np.uint64)
        owner = par[:len(wh)]
        valid = owner == par[W - 1:]
        best = np.full(nrows, np.uint64(0xFFFFFFFFFFFFFFFF))
        np.minimum.at(best, owner[valid], wh[valid])
        long = n >= W
        fp[long] = best[long]

    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fingerprint": pa.array(fp.astype(np.int64), pa.int64()),
    })


def fingerprints(ds):
    """documents → (doc_id, fingerprint) rolling-hash document fingerprint."""
    return ds.select_columns(["doc_id", "text"]).map_batches(
        _fp_batch, batch_format="pyarrow", zero_copy_batch=True)


def _vocab_partial(batch: pa.Table) -> pa.Table:
    """One batch → its (lang, term, cnt) partial counts (the combiner).

    Tokens = '\\S+' runs (split on whitespace, empties dropped) — the
    identical token definition token_stats counts and the DuckDB oracle
    extracts with regexp_extract_all(text, '\\S+'). The per-batch
    factorize+bincount collapses every block to its OWN vocabulary size
    before anything is shuffled."""
    import pandas as pd

    toks = pc.split_pattern_regex(batch.column("text"), r"\s+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    langs = pc.take(batch.column("lang"), parents)
    mask = pc.not_equal(flat, "")
    flat = flat.filter(mask)
    langs = langs.filter(mask)
    # separator = " ": tokens are '\S+' runs and lang codes contain no
    # space, so the join is unambiguous — and unlike "\x00", it survives
    # pandas' factorize hash (khash truncates object strings at an
    # embedded NUL, silently collapsing distinct keys)
    key = pc.binary_join_element_wise(langs, flat, " ")
    codes, uniques = pd.factorize(key.to_numpy(zero_copy_only=False))
    cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
    parts = pd.Series(uniques).str.partition(" ")
    return pa.table({
        "lang": pa.array(parts[0], pa.string()),
        "term": pa.array(parts[2], pa.string()),
        "cnt": pa.array(cnt, pa.int64()),
    })


def vocab_topk(ds, k: int = 10):
    """documents → the k most frequent whitespace tokens per lang:
    (lang, term, tf, rnk), rnk by tf DESC then term ASC. Exact integer
    counts — SQL-oracle-able.

    Scale shape: per-batch factorize+bincount partials (each block
    shrinks to its own vocabulary before the shuffle), a (lang, term)
    groupby-sum over partials, then one merge task for the top-k — the
    merge input is the total distinct vocabulary, which is sublinear in
    corpus size (Heaps' law) and independent of document count. For a
    vocabulary too large for one task, the merge would hash-partition
    by lang first; lang cardinality here is single-digit."""
    partials = ds.select_columns(["lang", "text"]).map_batches(
        _vocab_partial, batch_format="pyarrow", zero_copy_batch=True)

    merged = partials.repartition(1)

    def final(batch: pa.Table) -> pa.Table:
        import pandas as pd

        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        term = batch.column("term").to_numpy(zero_copy_only=False)
        cnt = batch.column("cnt").to_numpy().astype(np.int64)
        key = pc.binary_join_element_wise(
            batch.column("lang"), batch.column("term"), " ")
        codes, uniques = pd.factorize(key.to_numpy(zero_copy_only=False))
        tf = int_bincount(codes, cnt, len(uniques))
        # any representative row per code works (key ⟹ (lang, term))
        rep = np.empty(len(uniques), np.int64)
        rep[codes] = np.arange(len(codes), dtype=np.int64)
        # rank within lang: tf DESC, term ASC
        lang_u = lang[rep]
        term_u = term[rep]
        order = np.lexsort((term_u, -tf, lang_u))
        g_sorted = lang_u[order]
        starts = np.searchsorted(g_sorted, g_sorted, side="left")
        rnk = (np.arange(len(order)) - starts + 1).astype(np.int64)
        keep = rnk <= k
        sel = order[keep]
        return pa.table({
            "lang": pa.array(lang_u[sel], pa.string()),
            "term": pa.array(term_u[sel], pa.string()),
            "tf": pa.array(tf[sel], pa.int64()),
            "rnk": pa.array(rnk[keep], pa.int64()),
        })

    return merged.map_batches(final, batch_format="pyarrow",
                              batch_size=None)


#: redaction patterns, applied IN ORDER (emails before hex before bare
#: numbers, so a pattern never double-counts what an earlier one already
#: replaced); RE2 on both sides (pyarrow and DuckDB), so the oracle can
#: replay the identical chain
_REDACT = [
    (r"[\w.+-]+@[\w-]+\.[\w.]+", "<EMAIL>"),
    (r"\b0x[0-9a-fA-F]+\b", "<HEX>"),
    (r"\d+", "<NUM>"),
]


def redact_text(ds, id_cols=("doc_id",), text_col="text"):
    """(id_cols…, n_redactions, redacted_sha256): PII-style scrubbing
    (emails, hex ids, numbers → placeholder tokens) — the standard
    training-data cleaning stage. The sha256 of the redacted text makes
    the full transform output SQL-checkable without shipping the text
    (the corpus_sha256 invariant pattern)."""
    id_cols = list(id_cols)

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        n = np.zeros(len(text), np.int64)
        for pat, tok in _REDACT:
            n += np.asarray(pc.count_substring_regex(text, pat))
            text = pc.replace_substring_regex(text, pat, tok)
        sha = [hashlib.sha256(t.encode()).hexdigest()
               for t in text.to_pylist()]
        cols = {c: batch.column(c) for c in id_cols}
        cols["n_redactions"] = pa.array(n, pa.int64())
        cols["redacted_sha"] = pa.array(sha, pa.string())
        return pa.table(cols)

    return ds.select_columns(id_cols + [text_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# TF-IDF top-k terms per document
# --------------------------------------------------------------------------

def _doc_term_tf(batch: pa.Table) -> pa.Table:
    """One batch → its EXACT (doc_id, term, tf) rows: documents are
    whole rows, so a (doc, term) pair never spans blocks and no
    downstream combine is needed. Tokens = '\\S+' runs, the identical
    definition token_stats / vocab_topk / the DuckDB oracle use. The
    space join is unambiguous (tokens cannot contain whitespace) and
    survives pandas' factorize hash (see _vocab_partial on the NUL
    truncation trap)."""
    import pandas as pd

    toks = pc.split_pattern_regex(batch.column("text"), r"\s+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    dids = pc.take(batch.column("doc_id"), parents)
    mask = pc.not_equal(flat, "")
    flat = flat.filter(mask)
    dids = dids.filter(mask)
    key = pc.binary_join_element_wise(
        pc.cast(dids, pa.string()), flat, " ")
    codes, uniques = pd.factorize(key.to_numpy(zero_copy_only=False))
    tf = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
    parts = pd.Series(uniques).str.partition(" ")
    return pa.table({
        "doc_id": pa.array(parts[0].to_numpy().astype(np.int64),
                           pa.int64()),
        "term": pa.array(parts[2], pa.string()),
        "tf": pa.array(tf, pa.int64()),
    })


class _TfidfScorer:
    """Actor-pool scoring stage: the (term, df) table is fetched from
    the object store ONCE per actor in __init__ (the broadcast-small-
    side pattern — never re-shipped per batch); __call__ tokenizes its
    batch, looks up df vectorized, scores tf·ln(N/df) and emits the
    per-doc top-k directly — docs never span batches, so the output
    needs NO shuffle."""

    def __init__(self, df_ref, n_docs: int, k: int):
        import pandas as pd

        terms, dfs = ray.get(df_ref)
        self._idx = pd.Index(terms)
        self._dfs = dfs
        self._n = float(n_docs)
        self._k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = _doc_term_tf(batch)
        term = t.column("term").to_numpy(zero_copy_only=False)
        tf = t.column("tf").to_numpy()
        did = t.column("doc_id").to_numpy()
        pos = self._idx.get_indexer(term)
        if (pos < 0).any():
            raise ValueError(
                "term missing from the df table — the df pass and the "
                "scoring pass tokenized differently")
        dfv = self._dfs[pos]
        score = tf.astype(np.float64) * np.log(self._n / dfv)
        u, inv = np.unique(did, return_inverse=True)
        order = np.lexsort((term, -score, inv))
        g = inv[order]
        rnk = (np.arange(len(g))
               - np.searchsorted(g, g, side="left") + 1).astype(np.int64)
        keep = rnk <= self._k
        sel = order[keep]
        return pa.table({
            "doc_id": pa.array(did[sel], pa.int64()),
            "term": pa.array(term[sel], pa.string()),
            "tf": pa.array(tf[sel], pa.int64()),
            "df": pa.array(dfv[sel].astype(np.int64), pa.int64()),
            # UNROUNDED double: identical IEEE op chain in DuckDB
            # (tf * LN(n/df)), so the driver's round-then-hash compare
            # sees the same value on both sides
            "score": pa.array(score[sel], pa.float64()),
            "rnk": pa.array(rnk[keep], pa.int64()),
        })


def tfidf_topk(ds, k: int = 5, max_vocab: int = 20_000_000):
    """documents → the k highest tf·ln(N/df) terms per doc:
    (doc_id, term, tf, df, score, rnk), rnk by score DESC then term ASC.

    Scale shape: one streaming tokenize pass aggregates df per term
    (per-batch exact (doc, term, tf) rows → groupby count — the input
    to the shuffle is already collapsed to per-doc vocabulary); the
    (term, df) table — vocabulary-sized, Heaps-sublinear in corpus
    size — is broadcast once via ray.put and joined INSIDE the scoring
    actors, so the second pass emits final per-doc top-k rows with no
    output shuffle at all (documents are whole rows; a doc never spans
    batches). Vocabularies above `max_vocab` refuse loudly: the scale
    path is a distributed hash join on term plus a doc_id-hash
    re-shuffle for the top-k, which this operator intentionally does
    not silently fall into."""
    n_docs = ds.count()
    pairs = ds.select_columns(["doc_id", "text"]).map_batches(
        _doc_term_tf, batch_format="pyarrow", zero_copy_batch=True)
    dfagg = pairs.groupby("term").count()
    n_vocab = dfagg.count()
    if n_vocab > max_vocab:
        raise ValueError(
            f"vocabulary {n_vocab} exceeds max_vocab={max_vocab} for the "
            f"broadcast df table — use a distributed term hash join + "
            f"doc_id re-shuffle at this scale")
    dfpd = dfagg.to_pandas()
    order = np.argsort(dfpd["term"].to_numpy(), kind="stable")
    terms = dfpd["term"].to_numpy()[order]
    dfs = dfpd["count()"].to_numpy().astype(np.int64)[order]
    df_ref = ray.put((terms, dfs))
    # autoscaling pool (min 1): a fixed pool the size of the CPU count
    # deadlocks a small local session — upstream tasks can't get a slot
    return ds.select_columns(["doc_id", "text"]).map_batches(
        _TfidfScorer, fn_constructor_args=(df_ref, n_docs, k),
        concurrency=(1, 4), batch_format="pyarrow")


# ------------------------------------------------------- heavy hitters ----

def _mg_compress(terms: np.ndarray, counts: np.ndarray, cap: int):
    """Misra-Gries compress to at most `cap` counters: subtract the
    (cap+1)-th largest count from every counter and drop the
    non-positive. At most cap counts strictly exceed that threshold, so
    the survivor set fits; every counter undercounts by at most the
    subtracted value. Returns (terms, counts, subtracted)."""
    if len(terms) <= cap:
        return terms, counts, 0
    t = int(np.partition(counts, len(counts) - cap - 1)
            [len(counts) - cap - 1])
    keep = counts > t
    return terms[keep], counts[keep] - t, t


def _mg_partial(cap: int):
    """Per-batch Misra-Gries sketch: exact factorize+bincount counts for
    the block's own vocabulary, then one compress. Emits (term, cnt)
    rows plus the block's accumulated undercount in `err` (set on the
    first row, 0 elsewhere, so a plain SUM(err) is the stream total)."""
    def fn(batch: pa.Table) -> pa.Table:
        import pandas as pd

        toks = pc.split_pattern_regex(batch.column("text"), r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        codes, uniques = pd.factorize(flat.to_numpy(zero_copy_only=False))
        cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        terms, cnt, sub = _mg_compress(np.asarray(uniques, object), cnt,
                                       cap)
        err = np.zeros(len(terms), np.int64)
        if len(err):
            err[0] = sub
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "cnt": pa.array(cnt, pa.int64()),
            "err": pa.array(err, pa.int64()),
        })

    return fn


def heavy_hitters(ds, k: int = 40, capacity: int = 512):
    """documents → the k globally most frequent '\\S+' tokens with EXACT
    counts and a machine-checked exactness certificate: (term, cnt, rnk),
    rnk by cnt DESC then term ASC.

    Two passes, both bounded-memory — the 100-TB shape for top-k over an
    unbounded vocabulary (where vocab_topk's full-vocabulary merge would
    shuffle every distinct term):

    1. CANDIDATES: per-batch Misra-Gries sketches of `capacity` counters
       (each block compresses to O(capacity) rows before anything
       shuffles); one merge task sums + recompresses, so the driver pulls
       at most `capacity` candidate rows. The accumulated subtraction
       total `err` is an exact bound: any token absent from the merged
       sketch has true count ≤ err.
    2. VERIFY: one more streaming pass counts ONLY the ≤capacity
       candidate terms exactly (the candidate set is an O(capacity)
       per-task broadcast), and the top-k by exact count is emitted.

    Certificate: k-th exact count > err ⟹ no non-candidate can reach the
    top-k, so the result equals the exact top-k. Violation raises LOUD
    with the measured margin — never a silently approximate answer.
    """
    import pandas as pd

    texts = ds.select_columns(["text"])
    partials = texts.map_batches(_mg_partial(capacity),
                                 batch_format="pyarrow",
                                 zero_copy_batch=True)

    def merge_sketch(batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_numpy(zero_copy_only=False)
        cnts = np.asarray(batch.column("cnt"), np.int64)
        err = int(np.asarray(batch.column("err"), np.int64).sum())
        codes, uniq = pd.factorize(terms)
        csum = int_bincount(codes, cnts, len(uniq))
        ct, cc, sub = _mg_compress(np.asarray(uniq, object), csum,
                                   capacity)
        e = np.zeros(len(ct), np.int64)
        if len(e):
            e[0] = err + sub
        return pa.table({"term": pa.array(ct, pa.string()),
                         "cnt": pa.array(cc, pa.int64()),
                         "err": pa.array(e, pa.int64())})

    sk = (partials.repartition(1)
          .map_batches(merge_sketch, batch_format="pyarrow",
                       batch_size=None).take_all())
    cand = pa.array([r["term"] for r in sk], pa.string())
    err_total = int(sum(r["err"] for r in sk))

    def count_cands(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch.column("text"), r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        arr = flat.to_numpy(zero_copy_only=False)
        codes2, uniq2 = pd.factorize(arr)
        cnt2 = np.bincount(codes2, minlength=len(uniq2)).astype(np.int64)
        ua = pa.array(np.asarray(uniq2, object), pa.string())
        keep = pc.is_in(ua, value_set=cand).to_numpy(zero_copy_only=False)
        return pa.table({
            "term": ua.filter(pa.array(keep)),
            "cnt": pa.array(cnt2[keep], pa.int64()),
        })

    def merge_exact(batch: pa.Table) -> pa.Table:
        et = batch.column("term").to_numpy(zero_copy_only=False)
        ec = np.asarray(batch.column("cnt"), np.int64)
        codes3, uniq3 = pd.factorize(et)
        esum = int_bincount(codes3, ec, len(uniq3))
        order = np.lexsort((np.asarray(uniq3, object), -esum))
        topk = order[:k]
        return pa.table({
            "term": pa.array(np.asarray(uniq3, object)[topk],
                             pa.string()),
            "cnt": pa.array(esum[topk], pa.int64()),
            "rnk": pa.array(np.arange(1, len(topk) + 1, dtype=np.int64),
                            pa.int64()),
        })

    top = (texts.map_batches(count_cands, batch_format="pyarrow",
                             zero_copy_batch=True)
           .repartition(1)
           .map_batches(merge_exact, batch_format="pyarrow",
                        batch_size=None).take_all())
    kth = int(top[-1]["cnt"]) if len(top) else 0
    # fewer than k candidates only proves a complete answer when the
    # sketch never compressed (err 0 ⟹ it IS the exact full count table)
    if (kth <= err_total) or (len(top) < k and err_total > 0):
        raise ValueError(
            f"heavy_hitters certificate FAILED: {len(top)} candidates, "
            f"k-th exact count {kth} vs sketch undercount bound "
            f"{err_total}; a non-candidate could belong to the top-{k} "
            f"— raise capacity (={capacity}) and rerun")
    return pa.table({
        "term": pa.array([r["term"] for r in top], pa.string()),
        "cnt": pa.array([r["cnt"] for r in top], pa.int64()),
        "rnk": pa.array([r["rnk"] for r in top], pa.int64()),
    })


# --------------------------------------------------------------------------
# Repetition-based quality signals (Gopher-style n-gram repetition filters)
# --------------------------------------------------------------------------

def _repetition_batch(batch: pa.Table) -> pa.Table:
    """One batch → per-doc repetition signals. A document is a single
    row, so every n-gram of a doc lives inside the batch — the whole
    operator is embarrassingly parallel with NO shuffle.

    Counts are built by successive factorization so every intermediate
    code stays bounded by the batch's token-position count (never the
    vocabulary squared): unigram codes → bigram codes = factorize
    (code[i], code[i+1]) fused → trigram codes = factorize
    (bigram_code[i], code[i+2]) fused. Per-doc aggregation fuses the
    parent row index with the n-gram code (row_count × position_count
    keys, always < 2^63)."""
    import pandas as pd

    text = batch.column("text")
    nrows = len(text)
    toks = pc.split_pattern_regex(text, r"\s+")
    flat = pc.list_flatten(toks)
    par_arr = pc.list_parent_indices(toks)
    mask = pc.not_equal(flat, "")
    flat = flat.filter(mask)
    par = np.asarray(par_arr.filter(mask), np.int64)

    codes, uniq = pd.factorize(flat.to_numpy(zero_copy_only=False))
    codes = codes.astype(np.int64)
    U = max(len(uniq), 1)
    npos = len(codes)

    n_tokens = np.bincount(par, minlength=nrows).astype(np.int64)

    # distinct tokens per doc: unique (doc, token) keys, bucketed by doc
    dt_key = par * U + codes
    n_distinct = np.bincount(np.unique(dt_key) // U,
                             minlength=nrows).astype(np.int64)

    def _ngram_stats(gram_par: np.ndarray, gram_codes: np.ndarray,
                     n_codes: int):
        """(per-doc gram count, per-doc top-gram count)."""
        n_grams = np.bincount(gram_par, minlength=nrows).astype(np.int64)
        top = np.zeros(nrows, np.int64)
        if len(gram_codes):
            k = gram_par * n_codes + gram_codes
            uk, cnt = np.unique(k, return_counts=True)
            np.maximum.at(top, uk // n_codes, cnt.astype(np.int64))
        return n_grams, top

    # bigrams: consecutive positions within the same doc
    if npos >= 2:
        pm = par[:-1] == par[1:]
        bg_fused = codes[:-1] * U + codes[1:]
        bg_codes_all, _ = pd.factorize(bg_fused)
        bg_codes_all = bg_codes_all.astype(np.int64)
        nb = int(bg_codes_all.max()) + 1 if len(bg_codes_all) else 1
        n_bigrams, top_bigram = _ngram_stats(
            par[:-1][pm], bg_codes_all[pm], nb)
    else:
        bg_codes_all = np.zeros(0, np.int64)
        nb = 1
        n_bigrams = np.zeros(nrows, np.int64)
        top_bigram = np.zeros(nrows, np.int64)

    # trigrams: a bigram code at i fused with the unigram at i+2
    if npos >= 3:
        tm = (par[:-2] == par[1:-1]) & (par[1:-1] == par[2:])
        tg_fused = bg_codes_all[:-1] * U + codes[2:]
        tg_codes, _ = pd.factorize(tg_fused)
        tg_codes = tg_codes.astype(np.int64)
        nt = int(tg_codes.max()) + 1 if len(tg_codes) else 1
        n_trigrams, top_trigram = _ngram_stats(
            par[:-2][tm], tg_codes[tm], nt)
    else:
        n_trigrams = np.zeros(nrows, np.int64)
        top_trigram = np.zeros(nrows, np.int64)

    # IEEE-identical quotients (int64 → float64 division, 0 when empty),
    # the op chain the DuckDB oracle replays with CAST(... AS DOUBLE)
    with np.errstate(invalid="ignore"):
        dup_frac = np.where(
            n_tokens > 0,
            (n_tokens - n_distinct).astype(np.float64)
            / np.maximum(n_tokens, 1).astype(np.float64), 0.0)
        top_bigram_frac = np.where(
            n_bigrams > 0,
            top_bigram.astype(np.float64)
            / np.maximum(n_bigrams, 1).astype(np.float64), 0.0)

    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "n_distinct": pa.array(n_distinct, pa.int64()),
        "n_bigrams": pa.array(n_bigrams, pa.int64()),
        "top_bigram": pa.array(top_bigram, pa.int64()),
        "n_trigrams": pa.array(n_trigrams, pa.int64()),
        "top_trigram": pa.array(top_trigram, pa.int64()),
        "dup_frac": pa.array(dup_frac, pa.float64()),
        "top_bigram_frac": pa.array(top_bigram_frac, pa.float64()),
    })


def doc_repetition(ds):
    """documents → per-doc repetition quality signals (the Gopher-style
    repetition filters a training-data pipeline gates on): token count,
    distinct-token count, bigram/trigram totals, the count of the most
    frequent bigram/trigram, and the duplicate-token / top-bigram
    fractions. Exact integers + IEEE quotients — SQL-oracle-able.

    Tokens = '\\S+' runs (the package-wide definition); n-grams are
    consecutive token pairs/triples within a document."""
    return ds.select_columns(["doc_id", "text"]).map_batches(
        _repetition_batch, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# Cross-file boilerplate line removal (CCNet/RefinedWeb-style line dedup)
# --------------------------------------------------------------------------

def boilerplate_lines(ds, min_files: int = 3,
                      id_cols=("repo", "path"), text_col: str = "content",
                      max_frequent: int = 2_000_000):
    """Remove lines that occur in ≥ `min_files` distinct documents —
    the classic boilerplate scrub (license headers, shared imports,
    navigation chrome) a web/code training corpus needs before dedup.
    Output: (id_cols…, n_lines, n_removed, cleaned_sha256) where
    cleaned_sha256 hashes the document rebuilt from the surviving lines
    in their original order (the corpus_sha256 invariant pattern: the
    full transform output is SQL-checkable without shipping the text).

    Scale shape: pass A collapses every block to its OWN distinct lines
    (each document lives in exactly one row, so per-block distinct-file
    counts sum to the global distinct-file count), a (line) groupby-sum
    over those partials, then only the frequent lines — bounded above by
    total_lines / min_files and in practice tiny — are collected and
    broadcast once via ray.put. Pass B is stateless: membership test
    with a pyarrow is_in kernel, list rebuild from offsets, one
    binary_join per batch. Raises when the frequent set exceeds
    `max_frequent` (the refusal names the distributed-join fallback
    rather than silently materializing an unbounded driver-side set)."""
    import pandas as pd

    id_cols = list(id_cols)

    def partial(batch: pa.Table) -> pa.Table:
        lines = pc.split_pattern(batch.column(text_col), "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat = pc.list_flatten(lines)
        par = np.asarray(pc.list_parent_indices(lines), np.int64)
        codes, uniq = pd.factorize(flat.to_numpy(zero_copy_only=False))
        U = max(len(uniq), 1)
        # distinct (doc, line) pairs → per-line distinct-file count
        uk = np.unique(par * U + codes.astype(np.int64))
        nf = np.bincount(uk % U, minlength=U).astype(np.int64)
        return pa.table({"line": pa.array(np.asarray(uniq, object),
                                          pa.string()),
                         "nf": pa.array(nf, pa.int64())})

    def keep_frequent(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater_equal(batch.column("sum(nf)"),
                             pa.scalar(int(min_files), pa.int64())))

    freq_tbl = (ds.select_columns([text_col])
                .map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
                .groupby("line").sum("nf")
                .map_batches(keep_frequent, batch_format="pyarrow",
                             zero_copy_batch=True))
    freq_rows = freq_tbl.take_all()
    if len(freq_rows) > max_frequent:
        raise ValueError(
            f"boilerplate_lines: {len(freq_rows)} frequent lines exceeds "
            f"max_frequent={max_frequent}; switch to the distributed "
            f"path (hash-join the frequent-line table against the "
            f"exploded line stream instead of broadcasting)")
    frequent = pa.array([r["line"] for r in freq_rows], pa.string())
    freq_ref = ray.put(frequent)

    def scrub(batch: pa.Table) -> pa.Table:
        freq = ray.get(freq_ref)
        text = batch.column(text_col)
        nrows = len(text)
        lines = pc.split_pattern(text, "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat = pc.list_flatten(lines)
        par = np.asarray(pc.list_parent_indices(lines), np.int64)
        drop = np.asarray(pc.is_in(flat, value_set=freq))
        keep = ~drop
        n_lines = np.bincount(par, minlength=nrows).astype(np.int64)
        kept_counts = np.bincount(par[keep],
                                  minlength=nrows).astype(np.int64)
        offsets = np.zeros(nrows + 1, np.int64)
        np.cumsum(kept_counts, out=offsets[1:])
        # one batch's line total always fits list<int32> offsets
        assert offsets[-1] < 2 ** 31, "batch too large for list offsets"
        kept_lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), flat.filter(pa.array(keep)))
        cleaned = pc.binary_join(kept_lists, "\n")
        sha = [hashlib.sha256(t.encode()).hexdigest()
               for t in cleaned.to_pylist()]
        cols = {c: batch.column(c) for c in id_cols}
        cols["n_lines"] = pa.array(n_lines, pa.int64())
        cols["n_removed"] = pa.array(n_lines - kept_counts, pa.int64())
        cols["cleaned_sha"] = pa.array(sha, pa.string())
        return pa.table(cols)

    return ds.select_columns(id_cols + [text_col]).map_batches(
        scrub, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# Unigram-LM surprisal (perplexity-style quality score, exact-int protocol)
# --------------------------------------------------------------------------

class _SurprisalScorer:
    """Actor-pool scoring stage: the quantized (term, q) surprisal table
    is fetched from the object store ONCE per actor in __init__ and
    looked up vectorized per batch (the _TfidfScorer broadcast shape)."""

    def __init__(self, q_ref):
        import pandas as pd

        terms, qvals = ray.get(q_ref)
        self._idx = pd.Index(terms)
        self._q = qvals

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        par_arr = pc.list_parent_indices(toks)
        mask = pc.not_equal(flat, "")
        flat = flat.filter(mask)
        par = np.asarray(par_arr.filter(mask), np.int64)
        nrows = len(batch)
        pos = self._idx.get_indexer(flat.to_numpy(zero_copy_only=False))
        if (pos < 0).any():
            raise ValueError(
                "term missing from the count table — the counting pass "
                "and the scoring pass tokenized differently")
        q = self._q[pos]
        sq = np.zeros(nrows, np.int64)
        np.add.at(sq, par, q)
        ntok = np.bincount(par, minlength=nrows).astype(np.int64)
        avg = np.where(
            ntok > 0,
            sq.astype(np.float64) / 1048576.0
            / np.maximum(ntok, 1).astype(np.float64), 0.0)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(ntok, pa.int64()),
            "surprisal_q": pa.array(sq, pa.int64()),
            "avg_surprisal": pa.array(avg, pa.float64()),
        })


def doc_surprisal(ds, max_vocab: int = 20_000_000):
    """documents → per-doc unigram-LM surprisal, the perplexity-style
    quality score a corpus filter ranks on: for each token t with
    global count c out of N total tokens,
        q(t) = floor(ln(N/c) · 2^20)   (int64)
    and the doc's surprisal_q = Σ q(t) — an EXACT integer, so the sum
    is order-independent and bit-replayable in SQL (the package's
    floor-div quantization pattern: the float ln is computed once per
    VOCAB ENTRY — identical IEEE op chain in DuckDB — never accumulated
    in float across a document). avg_surprisal = surprisal_q / 2^20 /
    n_tokens rides along as the human-readable nats/token.

    Scale shape: one streaming tokenize pass aggregates global term
    counts (per-batch (doc, term, tf) rows collapse each block to its
    own vocabulary before the shuffle); the vocabulary-sized quantized
    table broadcasts once via ray.put into a scoring actor pool; the
    scoring pass is stateless per batch with no output shuffle.
    Vocabularies above `max_vocab` refuse loudly (the scale path is a
    distributed term hash join, as in tfidf_topk)."""
    pairs = ds.select_columns(["doc_id", "text"]).map_batches(
        _doc_term_tf, batch_format="pyarrow", zero_copy_batch=True)
    agg = pairs.groupby("term").sum("tf")
    n_vocab = agg.count()
    if n_vocab > max_vocab:
        raise ValueError(
            f"vocabulary {n_vocab} exceeds max_vocab={max_vocab} for "
            f"the broadcast count table — use a distributed term hash "
            f"join at this scale")
    cpd = agg.to_pandas()
    order = np.argsort(cpd["term"].to_numpy(), kind="stable")
    terms = cpd["term"].to_numpy()[order]
    cnts = cpd["sum(tf)"].to_numpy().astype(np.int64)[order]
    n_total = float(cnts.sum())
    qvals = np.floor(
        np.log(n_total / cnts.astype(np.float64)) * 1048576.0
    ).astype(np.int64)
    q_ref = ray.put((terms, qvals))
    return ds.select_columns(["doc_id", "text"]).map_batches(
        _SurprisalScorer, fn_constructor_args=(q_ref,),
        concurrency=(1, 4), batch_format="pyarrow")


# --------------------------------------------------------------------------
# Bigram counts (n-gram LM statistics)
# --------------------------------------------------------------------------

def _bigram_partial(batch: pa.Table) -> pa.Table:
    """One batch → its (lang, bigram, cnt) partial counts. Bigram
    strings are built with ZERO-COPY array slices (flat[:-1] ⊕ flat[1:])
    masked to same-document positions; the per-batch factorize+bincount
    collapses the block to its own bigram vocabulary before the shuffle
    (the _vocab_partial combiner shape, one n-gram order up)."""
    import pandas as pd

    toks = pc.split_pattern_regex(batch.column("text"), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    par_arr = pc.list_parent_indices(toks)
    mask = pc.not_equal(flat, "")
    flat = flat.filter(mask)
    par = np.asarray(par_arr.filter(mask), np.int64)
    if len(par) < 2:
        return pa.table({"lang": pa.array([], pa.string()),
                         "bigram": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    n = len(par)
    pairs = pc.binary_join_element_wise(
        flat.slice(0, n - 1), flat.slice(1, n - 1), " ")
    pm = pa.array(par[:-1] == par[1:])
    pairs = pairs.filter(pm)
    langs = pc.take(batch.column("lang"),
                    pa.array(par[:-1][par[:-1] == par[1:]]))
    # lang codes contain no space, so partition-on-first-space is
    # unambiguous even though the bigram itself embeds one space
    key = pc.binary_join_element_wise(langs, pairs, " ")
    codes, uniques = pd.factorize(key.to_numpy(zero_copy_only=False))
    cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
    parts = pd.Series(uniques).str.partition(" ")
    return pa.table({
        "lang": pa.array(parts[0], pa.string()),
        "bigram": pa.array(parts[2], pa.string()),
        "cnt": pa.array(cnt, pa.int64()),
    })


def bigram_topk(ds, k: int = 10):
    """documents → the k most frequent token BIGRAMS per lang:
    (lang, bigram, tf, rnk), rnk by tf DESC then bigram ASC — the
    n-gram LM count table a data pipeline feeds into smoothing /
    contamination checks. Exact integers, SQL-oracle-able.

    Same scale shape as vocab_topk: per-batch combiner partials, a
    bounded merge over the distinct-bigram vocabulary (sublinear in
    corpus size; for a vocabulary too large for one task the merge
    would hash-partition by lang)."""
    import pandas as pd

    partials = ds.select_columns(["lang", "text"]).map_batches(
        _bigram_partial, batch_format="pyarrow", zero_copy_batch=True)

    merged = partials.repartition(1)

    def final(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        bg = batch.column("bigram").to_numpy(zero_copy_only=False)
        cnt = batch.column("cnt").to_numpy().astype(np.int64)
        key = pc.binary_join_element_wise(
            batch.column("lang"), batch.column("bigram"), " ")
        codes, uniques = pd.factorize(key.to_numpy(zero_copy_only=False))
        tf = int_bincount(codes, cnt, len(uniques))
        rep = np.empty(len(uniques), np.int64)
        rep[codes] = np.arange(len(codes), dtype=np.int64)
        lang_u = lang[rep]
        bg_u = bg[rep]
        order = np.lexsort((bg_u, -tf, lang_u))
        g_sorted = lang_u[order]
        starts = np.searchsorted(g_sorted, g_sorted, side="left")
        rnk = (np.arange(len(order)) - starts + 1).astype(np.int64)
        keep = rnk <= k
        sel = order[keep]
        return pa.table({
            "lang": pa.array(lang_u[sel], pa.string()),
            "bigram": pa.array(bg_u[sel], pa.string()),
            "tf": pa.array(tf[sel], pa.int64()),
            "rnk": pa.array(rnk[keep], pa.int64()),
        })

    return merged.map_batches(final, batch_format="pyarrow",
                              batch_size=None)


def quality_threshold_filter(ds, k: int = 50):
    """Corpus filtering by a COMPUTED global statistic: keep the
    documents whose quality score is ≥ the k-th largest quality value
    in the corpus (a discrete order statistic — no interpolation, so
    the threshold is an exact float both sides reproduce bit-for-bit;
    ties at the threshold are included, making the result well-defined
    at any partitioning). Output (doc_id, quality).

    Scale shape: the scored (doc_id, quality) projection materializes
    once (two float columns — thousands of times smaller than the
    text); a per-batch top-k partial combiner bounds the threshold
    merge to O(blocks · k) values; the filter pass is stateless with
    the scalar threshold captured in the closure."""
    scored = (quality_score(ds)
              .select_columns(["doc_id", "quality"])
              .materialize())

    def partial(batch: pa.Table) -> pa.Table:
        q = np.asarray(batch.column("quality"), np.float64)
        top = np.sort(q)[::-1][:k]
        return pa.table({"quality": pa.array(top, pa.float64())})

    def kth(batch: pa.Table) -> pa.Table:
        q = np.sort(np.asarray(batch.column("quality"), np.float64))[::-1]
        th = q[min(k, len(q)) - 1] if len(q) else float("-inf")
        return pa.table({"th": pa.array([th], pa.float64())})

    th = (scored.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
          .repartition(1)
          .map_batches(kth, batch_format="pyarrow", batch_size=None)
          .take_all())[0]["th"]

    def filt(batch: pa.Table) -> pa.Table:
        q = np.asarray(batch.column("quality"), np.float64)
        m = pa.array(q >= th)
        return pa.table({"doc_id": batch.column("doc_id").filter(m),
                         "quality": batch.column("quality").filter(m)})

    return scored.map_batches(filt, batch_format="pyarrow",
                              zero_copy_batch=True)


def _entropy_batch(batch: pa.Table) -> pa.Table:
    """One batch → per-doc token Shannon entropy under the quantized
    exact-int protocol: ent_q = Σ_{distinct t} c_t · FLOOR(LN(c_t)·2^20)
    (int64, order-independent), entropy = LN(n) − ent_q/2^20/n in the
    identical IEEE chain the DuckDB oracle replays. Docs are whole rows,
    so every count is batch-local — NO shuffle. Accumulation uses
    np.add.at on int64 (exact at any doc length, unlike float-weighted
    bincount past 2^53)."""
    import pandas as pd

    text = batch.column("text")
    nrows = len(text)
    toks = pc.split_pattern_regex(text, r"\s+")
    flat = pc.list_flatten(toks)
    par_arr = pc.list_parent_indices(toks)
    mask = pc.not_equal(flat, "")
    flat = flat.filter(mask)
    par = np.asarray(par_arr.filter(mask), np.int64)

    codes, uniq = pd.factorize(flat.to_numpy(zero_copy_only=False))
    U = max(len(uniq), 1)
    n_tokens = np.bincount(par, minlength=nrows).astype(np.int64)

    ukey, ucnt = np.unique(par * U + codes.astype(np.int64),
                           return_counts=True)
    doc_idx = (ukey // U).astype(np.int64)
    qln = np.floor(np.log(ucnt.astype(np.float64))
                   * 1048576.0).astype(np.int64)
    ent_q = np.zeros(nrows, np.int64)
    np.add.at(ent_q, doc_idx, ucnt.astype(np.int64) * qln)

    entropy = np.zeros(nrows, np.float64)
    nz = n_tokens > 0
    entropy[nz] = (np.log(n_tokens[nz].astype(np.float64))
                   - ent_q[nz].astype(np.float64) / 1048576.0
                   / n_tokens[nz].astype(np.float64))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "ent_q": pa.array(ent_q, pa.int64()),
        "entropy": pa.array(entropy, pa.float64()),
    })


def doc_entropy(ds):
    """Per-doc token-distribution Shannon entropy (quality signal: low
    entropy = repetitive/templated text). Embarrassingly parallel; the
    quantized integer rides next to the float for bit-exact checking."""
    return ds.map_batches(_entropy_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def zipf_sums(ds, k: int = 100):
    """Per-lang Zipf rank-frequency regression sums over the top-k
    terms: x_r = floor(ln(rank)·2^20), y_r = floor(ln(tf)·2^20), and the
    exact BIGINT sums (n, Σx, Σy, Σx², Σxy) from which the log-log
    slope is (nΣxy − ΣxΣy)/(nΣx² − (Σx)²). Both engines floor the
    identical double products, so the sums are bit-exact — float
    summation order never appears. Rides vocab_topk's bounded merge;
    the fold is one in-block pass over ≤ langs·k rows."""
    ranked = vocab_topk(ds, k=k)

    def fold(batch: pa.Table) -> pa.Table:
        import pandas as pd

        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        tf = np.asarray(batch.column("tf"), np.int64)
        rnk = np.asarray(batch.column("rnk"), np.int64)
        x = np.floor(np.log(rnk.astype(np.float64))
                     * 1048576.0).astype(np.int64)
        y = np.floor(np.log(tf.astype(np.float64))
                     * 1048576.0).astype(np.int64)
        codes, uniq = pd.factorize(lang)
        m = len(uniq)
        out = {"n_terms": np.bincount(codes, minlength=m).astype(np.int64)}
        for name, v in (("sum_x", x), ("sum_y", y),
                        ("sum_xx", x * x), ("sum_xy", x * y)):
            acc = np.zeros(m, np.int64)
            np.add.at(acc, codes, v)
            out[name] = acc
        return pa.table({
            "lang": pa.array(np.asarray(uniq, object), pa.string()),
            "n_terms": pa.array(out["n_terms"], pa.int64()),
            "sum_x": pa.array(out["sum_x"], pa.int64()),
            "sum_y": pa.array(out["sum_y"], pa.int64()),
            "sum_xx": pa.array(out["sum_xx"], pa.int64()),
            "sum_xy": pa.array(out["sum_xy"], pa.int64()),
        })

    return ranked.map_batches(fold, batch_format="pyarrow",
                              batch_size=None)


def _distinct_tokens_partial(batch: pa.Table) -> pa.Table:
    """One batch → its DISTINCT '\\S+' tokens (the dedup combiner: each
    block collapses to its own vocabulary before the shuffle).

    Tokens containing NUL are rejected LOUDLY here, at the single entry
    point of both pair paths: the pairing kernels view vocabularies as
    numpy fixed-width U-dtype, which strips trailing NULs — "a" and
    "a\\x00" would silently merge (the oracle's levenshtein join keeps
    them distinct). \\x00 is a distance-1 edit like any other char, so
    supporting it needs a NUL-free encoding, not a separator trick."""
    flat = pc.list_flatten(pc.split_pattern_regex(batch.column(0),
                                                  r"\s+"))
    toks = pc.unique(flat.filter(pc.not_equal(flat, "")))
    has_nul = pc.any(pc.match_substring(toks, "\x00")).as_py()
    if has_nul:
        raise ValueError(
            "vocab_editdist_pairs: vocabulary contains NUL bytes, which "
            "numpy U-dtype strips (tokens would silently merge); "
            "pre-filter or re-encode NUL-bearing tokens")
    return pa.table({"tok": toks})


def _deletion_variants(toks: np.ndarray):
    """Single-deletion variants of a U-dtype token array, vectorized
    per length class: (variant, deletion position, owner index into
    `toks`). Length-1 tokens yield the empty-string variant at pos 0.
    The ONE implementation behind both pair paths — the scale-path ==
    small-path bit-for-bit pytest depends on them sharing it."""
    lens = np.char.str_len(toks) if len(toks) else np.zeros(0, np.int64)
    var_strs, var_pos, var_own = [], [], []
    for L in np.unique(lens):
        sel = np.flatnonzero(lens == L)
        if L == 1:
            var_strs.append(np.full(len(sel), "", dtype="U1"))
            var_pos.append(np.zeros(len(sel), np.int64))
            var_own.append(sel)
            continue
        mat = toks[sel].astype(f"U{L}").view(np.uint32).reshape(-1, int(L))
        for i in range(int(L)):
            var_strs.append(np.ascontiguousarray(
                np.delete(mat, i, axis=1)).view(f"U{int(L) - 1}").ravel())
            var_pos.append(np.full(len(sel), i, np.int64))
            var_own.append(sel)
    if not var_strs:
        return (np.zeros(0, "U1"), np.zeros(0, np.int64),
                np.zeros(0, np.int64))
    return (np.concatenate(var_strs), np.concatenate(var_pos),
            np.concatenate(var_own))


def _subpairs_by_key_pos(vkey: np.ndarray, vpos: np.ndarray,
                         vown: np.ndarray):
    """Owners sharing a (variant, deletion-position) group differ at
    exactly that position → substitution pairs. Returns (a, b) owner
    arrays (unordered, undeduped) — shared by both pair paths."""
    import pandas as pd

    out_a, out_b = [], []
    if len(vkey):
        vcode, _ = pd.factorize(vkey)
        gid = vcode.astype(np.int64) * np.int64(vpos.max() + 1) + vpos
        order = np.argsort(gid, kind="stable")
        g, o = gid[order], vown[order]
        first = np.searchsorted(g, g, side="left")
        starts = np.unique(first)
        counts = np.diff(np.append(starts, len(g)))
        for c in np.unique(counts[counts >= 2]):
            gs = starts[counts == c]
            members = o[gs[:, None] + np.arange(c)]
            iu, ju = np.triu_indices(int(c), k=1)
            out_a.append(members[:, iu].ravel())
            out_b.append(members[:, ju].ravel())
    return out_a, out_b


def _editdist1_pairs_from_vocab(toks: np.ndarray):
    """All unordered pairs of DISTINCT tokens at Levenshtein distance
    exactly 1, via single-DELETION variants (FastSS / SymSpell):

    - insert/delete pair: d(a, b) = 1 with |a| = |b|+1  ⟺  b is a
      deletion variant of a;
    - substitution pair: d(a, b) = 1 with |a| = |b|  ⟺  a and b share
      a deletion variant AT THE SAME POSITION (they agree everywhere
      but one index).

    Both conditions are exact in BOTH directions, so candidates ARE the
    answer — no per-pair distance verification pass. Returns
    (idx_a, idx_b) into the SORTED token array with idx_a < idx_b
    (sorted input ⟹ index order = lexicographic order)."""
    toks = np.unique(np.asarray(toks, dtype=str))  # sorted + deduped
    n = len(toks)
    if n == 0:
        return toks, np.zeros(0, np.int64), np.zeros(0, np.int64)
    variants, pos, owner = _deletion_variants(toks)

    # insert/delete pairs: variant present verbatim in the vocabulary
    # (never the owner itself — lengths differ by one)
    loc = np.searchsorted(toks, variants)
    loc[loc == n] = 0
    hit = toks[loc] == variants
    del_a = np.minimum(owner[hit], loc[hit])
    del_b = np.maximum(owner[hit], loc[hit])

    sub_a, sub_b = _subpairs_by_key_pos(variants, pos, owner)
    a = np.concatenate([del_a] + [np.minimum(x, y)
                                  for x, y in zip(sub_a, sub_b)])
    b = np.concatenate([del_b] + [np.maximum(x, y)
                                  for x, y in zip(sub_a, sub_b)])
    # dedupe (one pair can arise from several deletion positions)
    key = np.unique(a.astype(np.int64) * n + b)
    return toks, key // n, key % n


def _editdist1_emit_variants(num_buckets: int):
    """distinct tokens → (bucket, key, pos, owner) rows: one SELF row
    (pos = −1, key = token) plus one row per single-deletion variant
    (key = variant, pos = deletion index). bucket = hash(key) %
    num_buckets, so every row that can form a pair with a given key
    lands in the same groupby partition (del-pairs match a variant to a
    SELF row of the same key string; sub-pairs share (key, pos))."""
    import pandas as pd

    def fn(batch: pa.Table) -> pa.Table:
        toks = np.unique(np.asarray(
            batch.column("tok").to_numpy(zero_copy_only=False), dtype=str))
        vkey, vpos, vown = _deletion_variants(toks)
        key = np.concatenate([toks, vkey])
        pos = np.concatenate([np.full(len(toks), -1, np.int64), vpos])
        owner = np.concatenate([toks, toks[vown]])
        bucket = (pd.util.hash_array(key.astype(object))
                  % num_buckets).astype(np.int64)
        return pa.table({
            "bucket": pa.array(bucket, pa.int64()),
            "key": pa.array(key, pa.string()),
            "pos": pa.array(pos, pa.int64()),
            "owner": pa.array(owner, pa.string()),
        })

    return fn


def _editdist1_pairs_in_bucket(group: pa.Table) -> pa.Table:
    """One bucket's (key, pos, owner) rows → its distance-1 pairs.

    Complete and non-overlapping across buckets: a del-pair (a, b)
    |a|=|b|+1 exists iff some variant row of a has key == b, and b's
    SELF row shares that key (same bucket by construction); a sub-pair
    exists iff two owners share (key, pos). Every derivation of the
    same pair uses the same key string, so the per-bucket dedupe is
    globally sufficient."""
    import pandas as pd

    empty = pa.table({"tok_a": pa.array([], pa.string()),
                      "tok_b": pa.array([], pa.string())})
    if group.num_rows == 0:
        return empty
    key = np.asarray(group.column("key").to_numpy(zero_copy_only=False),
                     dtype=str)
    pos = np.asarray(group.column("pos"), np.int64)
    own = np.asarray(group.column("owner").to_numpy(zero_copy_only=False),
                     dtype=str)
    selfm = pos == -1
    selfkeys = np.unique(key[selfm])
    vkey, vpos, vown = key[~selfm], pos[~selfm], own[~selfm]
    pair_a, pair_b = [], []
    if len(vkey) and len(selfkeys):
        loc = np.searchsorted(selfkeys, vkey)
        loc[loc == len(selfkeys)] = 0
        hit = selfkeys[loc] == vkey
        pair_a.append(vown[hit])
        pair_b.append(vkey[hit])
    sa, sb = _subpairs_by_key_pos(vkey, vpos, vown)
    pair_a += sa
    pair_b += sb
    if not pair_a:
        return empty
    a = np.concatenate(pair_a)
    b = np.concatenate(pair_b)
    if len(a) == 0:
        return empty
    swap = a > b
    a, b = np.where(swap, b, a), np.where(swap, a, b)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    return pa.table({"tok_a": pa.array(a[keep], pa.string()),
                     "tok_b": pa.array(b[keep], pa.string())})


def vocab_editdist_pairs(ds, column: str = "text",
                         vocab_cap: int = 2_000_000,
                         num_buckets: int = 256):
    """documents → every unordered pair of distinct vocabulary tokens at
    Levenshtein distance exactly 1: (tok_a, tok_b), tok_a < tok_b —
    typo-variant detection, the character-level cousin of the MinHash
    document dedup (north-rule training-data op; no reference analogue).

    Scale shape: per-batch DISTINCT-token partials (each block shrinks
    to its own vocabulary before the shuffle), a global distinct
    (grouped, stays sharded), then deletion-variant candidate
    generation whose cost is O(Σ_tok len(tok)²) characters — linear in
    vocabulary bytes for bounded token length and INDEPENDENT of
    document count; no all-pairs comparison ever happens (the DuckDB
    oracle's quadratic levenshtein join is the semantics, not the
    plan). Vocabularies ≤ `vocab_cap` pair in one task; bigger ones
    take the VARIANT-HASH SCALE PATH: every token emits a self row
    plus its deletion-variant rows, rows hash-partition by key string
    (one groupby), and each bucket emits its pairs independently —
    per-bucket dedupe is globally sufficient because every derivation
    of a pair shares its key string (pytest pins scale == small-path
    output bit-for-bit; the sf1 corpus, 25.6M distinct tokens, runs
    only this path)."""
    from ray.data.aggregate import Count

    distinct = (ds.select_columns([column])
                .map_batches(_distinct_tokens_partial,
                             batch_format="pyarrow", zero_copy_batch=True)
                .groupby("tok").aggregate(Count(alias_name="c"))
                .select_columns(["tok"]).materialize())
    n = distinct.count()

    if n > vocab_cap:
        return (distinct
                .map_batches(_editdist1_emit_variants(num_buckets),
                             batch_format="pyarrow",
                             zero_copy_batch=True)
                .groupby("bucket")
                .map_groups(_editdist1_pairs_in_bucket,
                            batch_format="pyarrow"))

    def final(batch: pa.Table) -> pa.Table:
        toks = pc.unique(batch.column("tok")).to_numpy(
            zero_copy_only=False)
        toks, ia, ib = _editdist1_pairs_from_vocab(toks)
        return pa.table({
            "tok_a": pa.array(toks[ia], pa.string()),
            "tok_b": pa.array(toks[ib], pa.string()),
        })

    return distinct.repartition(1).map_batches(final,
                                               batch_format="pyarrow",
                                               batch_size=None)
