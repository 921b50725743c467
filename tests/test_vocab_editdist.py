"""vocab_editdist_pairs: FastSS deletion-variant kernel vs brute-force
Levenshtein on adversarial and random vocabularies (no Ray needed — the
kernel is a pure function; the end-to-end path is gate-checked against
the DuckDB levenshtein oracle)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from leiden_cuda_ray.functions.text import _editdist1_pairs_from_vocab


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(toks):
    toks = sorted(set(toks))
    return sorted((a, b) for i, a in enumerate(toks)
                  for b in toks[i + 1:] if _lev(a, b) == 1)


def _kernel(toks):
    t, ia, ib = _editdist1_pairs_from_vocab(np.asarray(list(toks)))
    return sorted(zip(t[ia].tolist(), t[ib].tolist()))


@pytest.mark.parametrize("vocab", [
    # substitution / insert / delete / transposition (=2, excluded)
    ["cat", "cut", "cart", "art", "ca", "cats", "ab", "ba"],
    # length-1 tokens: all pairs are substitutions at position 0
    ["a", "b", "c", "ab"],
    # unicode beyond ASCII
    ["naïve", "naive", "naïves", "née", "ne"],
    # prefix-colliding families (the adversarial-keys vocabulary class)
    ["javascript_x", "java_script_x", "javascriptx", "javascript"],
    # identical-after-dedupe inputs
    ["dup", "dup", "dupe"],
    [],
    ["solo"],
])
def test_kernel_matches_brute_force(vocab):
    assert _kernel(vocab) == _brute(vocab)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(alphabet="abAB_0é", min_size=1, max_size=5),
                min_size=0, max_size=40))
def test_kernel_matches_brute_force_fuzz(vocab):
    assert _kernel(vocab) == _brute(vocab)


def test_pairs_are_ordered_and_distinct():
    t, ia, ib = _editdist1_pairs_from_vocab(
        np.asarray(["aa", "ab", "ba", "b", "a"]))
    assert (t[ia] < t[ib]).all()
    keys = set(zip(ia.tolist(), ib.tolist()))
    assert len(keys) == len(ia)


def test_scale_path_equals_small_path(ray_session):
    """The variant-hash groupby scale path must produce bit-identical
    pairs to the one-task kernel on the same corpus."""
    import ray.data

    from leiden_cuda_ray.functions.text import vocab_editdist_pairs
    from leiden_cuda_ray.sources.corpus import (
        ensure_corpus_for_sf_dir,
        read_corpus,
    )

    p = ensure_corpus_for_sf_dir("/root/testdata/sf0.001")
    small = vocab_editdist_pairs(
        read_corpus(p, columns=["content"]), column="content",
        vocab_cap=10**9).to_pandas()
    scale = vocab_editdist_pairs(
        read_corpus(p, columns=["content"]), column="content",
        vocab_cap=0, num_buckets=17).to_pandas()
    key = ["tok_a", "tok_b"]
    s1 = small.sort_values(key).reset_index(drop=True)
    s2 = scale.sort_values(key).reset_index(drop=True)
    assert len(s1) and s1.equals(s2)
