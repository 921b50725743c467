"""Training-data operators: dedup, similarity, text analysis, multimodal."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data


@pytest.fixture(scope="module")
def docs_ds():
    rows = [
        {"doc_id": 0, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 2, "text": "the quick brown fox jumped over the lazy dog"},
        {"doc_id": 3, "text": "completely different content about graphs"},
        {"doc_id": 4, "text": "der schnelle braune fuchs springt und ist nicht langsam"},
        {"doc_id": 5, "text": ""},
    ]
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def test_exact_dedup(docs_ds):
    from leiden_cuda_ray.functions.dedup import exact_dedup_keepers

    keep = sorted(r["doc_id"] for r in exact_dedup_keepers(docs_ds).take_all())
    assert keep == [0, 2, 3, 4, 5]  # doc 1 is an exact dup of 0


def test_minhash_finds_near_dups(docs_ds):
    from leiden_cuda_ray.functions.dedup import (
        lsh_candidate_pairs, minhash_signatures)

    sigs = minhash_signatures(docs_ds)
    pairs = lsh_candidate_pairs(sigs, threshold=0.5).to_pandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    assert (0, 1) in got  # exact dup pair
    assert (0, 2) in got or (1, 2) in got  # near dup (one word changed)
    assert (0, 3) not in got  # unrelated


def test_lsh_join_path_matches_broadcast_path(docs_ds, monkeypatch):
    """Large pair sets take the Ray-Data-join estimate path; it must
    produce the identical pairs as the small-set broadcast path."""
    from leiden_cuda_ray.functions import dedup

    sigs = dedup.minhash_signatures(docs_ds)
    small = dedup.lsh_candidate_pairs(sigs, threshold=0.5).to_pandas()
    monkeypatch.setattr(dedup, "_SMALL_PAIRS_MAX", -1)
    joined = dedup.lsh_candidate_pairs(sigs, threshold=0.5).to_pandas()
    key = ["doc_a", "doc_b"]
    a = small.sort_values(key).reset_index(drop=True)
    b = joined.sort_values(key).reset_index(drop=True)
    assert a[key].equals(b[key])
    assert np.allclose(a["est_jaccard"], b["est_jaccard"])


def test_minhash_dedup_keepers(docs_ds):
    from leiden_cuda_ray.functions.dedup import minhash_dedup_keepers

    keep = sorted(r["doc_id"]
                  for r in minhash_dedup_keepers(docs_ds,
                                                 threshold=0.95).take_all())
    assert 0 in keep and 1 not in keep  # exact dup dropped, min id kept
    assert 3 in keep and 4 in keep


def test_simhash_near_dup(docs_ds):
    from leiden_cuda_ray.functions.dedup import simhash, simhash_dup_pairs

    sh = simhash(docs_ds)
    rows = {r["doc_id"]: r["simhash"] for r in sh.take_all()}
    assert rows[0] == rows[1]  # identical text, identical simhash
    pairs = simhash_dup_pairs(sh, max_hamming=16).to_pandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    assert (0, 1) in got


def test_ngram_jaccard_verify(docs_ds):
    from leiden_cuda_ray.functions.dedup import (
        lsh_candidate_pairs, minhash_signatures, ngram_jaccard_verify)

    pairs = lsh_candidate_pairs(minhash_signatures(docs_ds), threshold=0.5)
    verified = ngram_jaccard_verify(pairs, docs_ds).to_pandas()
    exact = verified[(verified.doc_a == 0) & (verified.doc_b == 1)]
    assert len(exact) == 1 and exact.jaccard.iloc[0] == pytest.approx(1.0)


def test_embedding_dup_pairs():
    from leiden_cuda_ray.functions.dedup import embedding_dup_pairs

    rng = np.random.RandomState(0)
    base = rng.randn(8, 16)
    vecs = np.vstack([base, base[0] + 1e-4 * rng.randn(16)])  # 8 is dup of 0
    rows = [{"vec_id": i, "embedding": v.tolist()}
            for i, v in enumerate(vecs)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    pairs = embedding_dup_pairs(ds, threshold=0.99).to_pandas()
    got = set(map(tuple, pairs[["vec_a", "vec_b"]].to_numpy()))
    assert (0, 8) in got


def test_embedding_dup_pairs_exact_matches_numpy():
    from leiden_cuda_ray.functions.dedup import embedding_dup_pairs_exact

    rng = np.random.RandomState(0)
    base = rng.randn(8, 16)
    vecs = np.vstack([base, base[0] + 1e-4 * rng.randn(16)])  # 8 is dup of 0
    rows = [{"vec_id": i, "embedding": v.tolist()}
            for i, v in enumerate(vecs)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    pairs = embedding_dup_pairs_exact(ds, threshold=0.99).to_pandas()
    # exact join = numpy all-pairs ground truth, every pair found once
    U = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    S = U @ U.T
    iu, ju = np.triu_indices(len(vecs), 1)
    want = {(int(a), int(b)) for a, b in zip(iu[S[iu, ju] >= 0.99],
                                             ju[S[iu, ju] >= 0.99])}
    got = sorted(map(tuple, pairs[["vec_a", "vec_b"]].to_numpy()))
    assert sorted(want) == got and len(got) == len(set(got))


def test_embedding_dup_pairs_exact_refuses_at_scale():
    """The brute-force oracle path must never materialize a big table
    driver-side: above max_rows it errors and names the LSH scale path."""
    import pytest

    from leiden_cuda_ray.functions.dedup import embedding_dup_pairs_exact

    rows = [{"vec_id": i, "embedding": [float(i), 1.0]} for i in range(12)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    with pytest.raises(ValueError, match="embedding_dup_pairs"):
        embedding_dup_pairs_exact(ds, max_rows=10)


def test_knn_brute_matches_numpy():
    from leiden_cuda_ray.functions.similarity import knn_brute

    rng = np.random.RandomState(1)
    X = rng.randn(100, 16)
    rows = [{"vec_id": i, "embedding": v.tolist()} for i, v in enumerate(X)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    Q = X[:3]
    res = knn_brute(ds, Q, k=5).to_pandas()
    Xn = X / np.linalg.norm(X, axis=1)[:, None]
    Qn = Q / np.linalg.norm(Q, axis=1)[:, None]
    S = Qn @ Xn.T
    for qi in range(3):
        expect = np.lexsort((np.arange(100), -S[qi]))[:5]
        got = res[res.query_id == qi].sort_values("rank").neighbor_id.to_numpy()
        assert np.array_equal(got, expect)
        assert got[0] == qi  # self is nearest


def test_knn_ivf_recall():
    from leiden_cuda_ray.functions.similarity import knn_brute, knn_ivf

    rng = np.random.RandomState(2)
    centers = rng.randn(4, 16) * 5
    X = np.vstack([c + rng.randn(50, 16) * 0.3 for c in centers])
    rows = [{"vec_id": i, "embedding": v.tolist()} for i, v in enumerate(X)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    Q = X[[0, 60, 120]]
    exact = knn_brute(ds, Q, k=5).to_pandas()
    approx = knn_ivf(ds, Q, k=5, n_centroids=4, n_probe=2).to_pandas()
    # recall@5 over the 3 queries
    hits = 0
    for qi in range(3):
        e = set(exact[exact.query_id == qi].neighbor_id)
        a = set(approx[approx.query_id == qi].neighbor_id)
        hits += len(e & a)
    assert hits >= 12  # >= 80% recall on well-separated clusters


def test_token_stats_and_language_id(docs_ds):
    from leiden_cuda_ray.functions.text import language_id, token_stats

    stats = {r["doc_id"]: r for r in token_stats(docs_ds).take_all()}
    assert stats[0]["n_tokens"] == 9
    assert stats[5]["n_tokens"] == 0
    assert stats[0]["n_chars"] == len(
        "the quick brown fox jumps over the lazy dog")

    langs = {r["doc_id"]: r["lang_pred"] for r in language_id(docs_ds).take_all()}
    assert langs[0] == "en"
    assert langs[4] == "de"
    assert langs[5] == "unknown"


def test_quality_and_fingerprints(docs_ds):
    from leiden_cuda_ray.functions.text import fingerprints, quality_score

    q = {r["doc_id"]: r["quality"] for r in quality_score(docs_ds).take_all()}
    assert q[0] > q[5]  # real sentence beats empty text
    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprints(docs_ds).take_all()}
    assert fp[0] == fp[1]  # identical docs, identical fingerprint
    assert fp[0] != fp[3]


def test_multimodal_decode_stub():
    from leiden_cuda_ray.functions.multimodal import (
        DecodeImage, decode_images, make_fake_media_dataset)

    ds = make_fake_media_dataset(n=12)
    out = decode_images(ds, concurrency=2, batch_size=4).to_pandas()
    assert len(out) == 12
    assert set(out.columns) == {"media_id", "height", "width", "channels",
                                "features"}
    assert (out.height >= 64).all() and (out.height < 256).all()
    feats = np.stack(out.features.to_numpy())
    assert feats.shape == (12, 32)
    assert np.allclose(feats.sum(axis=1), 1.0)
    # codec-format contract: unsupported magic without pillow raises at
    # decode time, naming the magic
    jpeg_like = pa.table({"media_id": pa.array([0], pa.int64()),
                          "payload": pa.array([b"\xff\xd8\xe0junk"],
                                              pa.binary())})
    with pytest.raises(NotImplementedError, match="magic"):
        DecodeImage(fake=False)(jpeg_like)


def test_pnm_codec_roundtrip():
    from leiden_cuda_ray.functions.multimodal import decode_pnm, encode_pnm

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    assert (decode_pnm(encode_pnm(rgb)) == rgb).all()
    grey = rng.integers(0, 256, (5, 4), dtype=np.uint8)
    assert (decode_pnm(encode_pnm(grey)) == grey).all()
    # header comments per the netpbm spec
    commented = b"P5\n# a comment\n4 2\n# another\n255\n" + bytes(range(8))
    assert (decode_pnm(commented) ==
            np.arange(8, dtype=np.uint8).reshape(2, 4)).all()
    with pytest.raises(ValueError):
        decode_pnm(b"GIF89a...")


def test_multimodal_real_image_decode_and_resize():
    from leiden_cuda_ray.functions.multimodal import (
        ResizeImage, _image_dims, decode_images, make_real_media_dataset)

    ds = make_real_media_dataset(n=10, media_type="image")
    decoded = decode_images(ds, concurrency=2, batch_size=4, fake=False,
                            emit_pixels=True)
    out = decoded.to_pandas().sort_values("media_id")
    # real geometry extracted from actual PPM bytes
    for _, r in out.iterrows():
        h, w = _image_dims(int(r.media_id))
        assert (r.height, r.width, r.channels) == (h, w, 3)
    # features are the true pixel histogram: recompute directly
    row = out.iloc[3]
    img = np.frombuffer(row.pixels, np.uint8)
    hist = np.bincount((img.astype(np.int64) * 32) >> 8, minlength=32)
    assert np.allclose(np.array(row.features), hist / hist.sum())
    # real nearest-neighbour resize on a known pattern
    resized = decoded.map_batches(ResizeImage,
                                  fn_constructor_kwargs={"target": (8, 8)},
                                  batch_format="pyarrow",
                                  concurrency=1).to_pandas()
    r0 = resized[resized.media_id == 3].iloc[0]
    assert (r0.height, r0.width) == (8, 8)
    h, w = _image_dims(3)
    src = np.frombuffer(row.pixels, np.uint8).reshape(h, w, 3)
    ri, ci = (np.arange(8) * h) // 8, (np.arange(8) * w) // 8
    assert (np.frombuffer(r0.pixels, np.uint8).reshape(8, 8, 3)
            == src[ri][:, ci]).all()


def test_multimodal_real_audio_and_video():
    from leiden_cuda_ray.functions.multimodal import (
        AudioFeatures, SampleFrames, decode_wav, decode_y4m, encode_wav,
        encode_y4m, make_real_media_dataset)

    # WAV round-trip via the stdlib codec
    sig = (np.sin(np.linspace(0, 20, 400)) * 20000).astype(np.int16)
    mono, rate = decode_wav(encode_wav(sig, 8000))
    assert rate == 8000 and np.allclose(mono, sig / 32768.0, atol=1e-9)

    auds = make_real_media_dataset(n=4, media_type="audio")
    feats = auds.map_batches(AudioFeatures,
                             fn_constructor_kwargs={"fake": False},
                             batch_format="pyarrow",
                             concurrency=1).to_pandas()
    assert (feats.sample_rate == 8000).all()
    # band RMS of a 0.5-amplitude sine is ~0.5/sqrt(2) per band (each band
    # spans <1 period here, so allow partial-cycle wobble)
    f0 = np.array(feats[feats.media_id == 0].iloc[0].features)
    assert np.allclose(f0, 0.5 / np.sqrt(2), atol=0.06)

    # y4m round-trip + deterministic frame sampling
    frames_in = [np.full((6, 8), v, np.uint8) for v in (10, 20, 30, 40, 50)]
    w, h, cs, frames_out = decode_y4m(encode_y4m(frames_in))
    assert (w, h, cs) == (8, 6, "mono")
    assert [f[0] for f in frames_out] == [10, 20, 30, 40, 50]

    vids = make_real_media_dataset(n=3, media_type="video")
    sampled = vids.map_batches(SampleFrames,
                               fn_constructor_kwargs={"n_frames": 2,
                                                      "fake": False},
                               batch_format="pyarrow",
                               concurrency=1).to_pandas()
    assert len(sampled) == 6  # 2 per video
    v0 = sampled[sampled.media_id == 0].sort_values("frame_index")
    assert list(v0.frame_index) == [0, 2]  # (k * 4) // 2 for k in 0,1
    assert (v0.iloc[0].height, v0.iloc[0].width) == (16, 16)
    assert len(v0.iloc[0].frame) == 16 * 16  # exact Cmono frame bytes


def test_multimodal_frames_and_audio():
    from leiden_cuda_ray.functions.multimodal import (
        AudioFeatures, SampleFrames, make_fake_media_dataset)

    vids = make_fake_media_dataset(n=3, media_type="video")
    frames = vids.map_batches(SampleFrames, batch_format="pyarrow",
                              concurrency=1).to_pandas()
    assert len(frames) == 12  # 3 videos x 4 frames
    assert set(frames.frame_index) == {0, 1, 2, 3}

    auds = make_fake_media_dataset(n=3, media_type="audio")
    feats = auds.map_batches(AudioFeatures, batch_format="pyarrow",
                             concurrency=1).to_pandas()
    assert np.stack(feats.features.to_numpy()).shape == (3, 16)


def test_vocab_topk_matches_pandas_and_is_blocking_invariant():
    """vocab_topk must equal a single-process pandas wordcount and be
    independent of how rows are split into blocks (the partial counts
    must combine exactly)."""
    import pandas as pd

    from leiden_cuda_ray.functions.text import vocab_topk

    rows = []
    rng = np.random.RandomState(5)
    words = ["alpha", "beta", "gamma", "delta", "x", "it's", "a,b"]
    for i in range(60):
        lang = ["en", "de"][i % 2]
        text = "  ".join(rng.choice(words, rng.randint(1, 12)))
        rows.append({"doc_id": i, "lang": lang, "text": " " + text + "\n"})
    t = pa.Table.from_pylist(rows)

    def run(n_blocks):
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        return (vocab_topk(ds, k=3).to_pandas()
                .sort_values(["lang", "rnk"]).reset_index(drop=True))

    got1, got4 = run(1), run(4)
    pd.testing.assert_frame_equal(got1, got4)

    toks = []
    for r in rows:
        for w in r["text"].split():
            toks.append((r["lang"], w))
    df = pd.DataFrame(toks, columns=["lang", "term"])
    agg = (df.groupby(["lang", "term"]).size().rename("tf")
           .reset_index())
    agg = agg.sort_values(["lang", "tf", "term"],
                          ascending=[True, False, True])
    agg["rnk"] = agg.groupby("lang").cumcount() + 1
    want = (agg[agg.rnk <= 3].reset_index(drop=True)
            [["lang", "term", "tf", "rnk"]])
    want["tf"] = want["tf"].astype("int64")
    want["rnk"] = want["rnk"].astype("int64")
    pd.testing.assert_frame_equal(got1, want)


def test_redact_text_patterns_and_sha():
    """Redaction must scrub emails, hex ids and numbers in order,
    count each replacement once, and hash the final text."""
    import hashlib

    from leiden_cuda_ray.functions.text import redact_text

    rows = [
        {"doc_id": 0, "text": "mail a.b+c@x-y.co end 0xDEAD 42 7"},
        {"doc_id": 1, "text": "clean words only"},
        {"doc_id": 2, "text": "v1 v2 0xff"},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    got = (redact_text(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want_text = ["mail <EMAIL> end <HEX> <NUM> <NUM>",
                 "clean words only",
                 "v<NUM> v<NUM> <HEX>"]
    assert got.n_redactions.tolist() == [4, 0, 3]
    assert got.redacted_sha.tolist() == [
        hashlib.sha256(t.encode()).hexdigest() for t in want_text]


def test_cross_split_overlap_exact_and_blocking_invariant():
    """Decontamination counts must equal a direct computation of
    distinct shared trigrams across the deterministic split, and be
    independent of block layout."""
    import pandas as pd

    from leiden_cuda_ray.functions.dedup import cross_split_overlap
    from leiden_cuda_ray.functions.sampling import splitmix_bucket

    rng = np.random.RandomState(17)
    words = ["a", "b", "c", "d", "e", "f"]
    rows = [{"doc_id": i,
             "text": " ".join(rng.choice(words, rng.randint(3, 15)))}
            for i in range(40)]
    t = pa.Table.from_pylist(rows)

    def run(n_blocks):
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        return (cross_split_overlap(ds, max_df=50).to_pandas()
                .sort_values(["train_doc", "val_doc"])
                .reset_index(drop=True))

    got1, got4 = run(1), run(4)
    pd.testing.assert_frame_equal(got1, got4)

    grams = {}
    for r in rows:
        ws = r["text"].split()
        gs = {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}
        grams[r["doc_id"]] = gs
    df_count = {}
    for gs in grams.values():
        for g in gs:
            df_count[g] = df_count.get(g, 0) + 1
    is_train = {i: splitmix_bucket(np.array([i]), 42, 100)[0] < 80
                for i in grams}
    want = {}
    for a in grams:
        for b in grams:
            if not (is_train[a] and not is_train[b]):
                continue
            shared = {g for g in grams[a] & grams[b]
                      if df_count[g] <= 50}
            if shared:
                want[(a, b)] = len(shared)
    got = {(r.train_doc, r.val_doc): r.n_shared
           for r in got1.itertuples()}
    assert got == want


def test_tfidf_topk_matches_pandas_and_is_blocking_invariant():
    """tfidf_topk must equal a single-process pandas computation of
    tf*ln(N/df) with score-DESC/term-ASC ranking and be independent of
    block splits (the df pass and the scoring pass must see the same
    vocabulary)."""
    import pandas as pd

    from leiden_cuda_ray.functions.text import tfidf_topk

    rows = []
    rng = np.random.RandomState(9)
    words = ["alpha", "beta", "gamma", "delta", "x", "it's", "a,b",
             "zz", "qq"]
    for i in range(50):
        text = "  ".join(rng.choice(words, rng.randint(1, 15)))
        rows.append({"doc_id": i, "text": " " + text + "\n"})
    t = pa.Table.from_pylist(rows)

    def run(n_blocks):
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        return (tfidf_topk(ds, k=3).to_pandas()
                .sort_values(["doc_id", "rnk"]).reset_index(drop=True))

    got1, got4 = run(1), run(4)
    pd.testing.assert_frame_equal(got1, got4)

    toks = []
    for r in rows:
        for w in r["text"].split():
            toks.append((r["doc_id"], w))
    df = pd.DataFrame(toks, columns=["doc_id", "term"])
    tf = (df.groupby(["doc_id", "term"]).size().rename("tf")
          .reset_index())
    dfx = tf.groupby("term").size().rename("df").reset_index()
    sc = tf.merge(dfx, on="term")
    sc["score"] = sc["tf"] * np.log(len(rows) / sc["df"])
    sc = sc.sort_values(["doc_id", "score", "term"],
                        ascending=[True, False, True])
    sc["rnk"] = sc.groupby("doc_id").cumcount() + 1
    want = (sc[sc.rnk <= 3].reset_index(drop=True)
            [["doc_id", "term", "tf", "df", "score", "rnk"]])
    for c in ["doc_id", "tf", "df", "rnk"]:
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got1, want)


def test_heavy_hitters_exact_with_certificate():
    """heavy_hitters must equal the exact Counter top-k (count DESC,
    term ASC) whenever the certificate passes — at any blocking — and
    the too-small-capacity path must fail LOUD, never approximate."""
    from collections import Counter

    import pytest as _pytest

    from leiden_cuda_ray.functions.text import heavy_hitters

    rng = np.random.RandomState(9)
    # zipf-ish: token i has weight ~ 1/(i+1)
    vocab = [f"w{i:03d}" for i in range(200)]
    p = 1.0 / np.arange(1, 201)
    p /= p.sum()
    rows = []
    for i in range(80):
        text = " ".join(rng.choice(vocab, size=rng.randint(5, 40), p=p))
        rows.append({"doc_id": i, "text": text})
    t = pa.Table.from_pylist(rows)

    cnt = Counter()
    for r in rows:
        cnt.update(r["text"].split())
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    for n_blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        got = heavy_hitters(ds, k=10, capacity=64).to_pylist()
        assert [(r["term"], r["cnt"]) for r in got] == want
        assert [r["rnk"] for r in got] == list(range(1, 11))

    # capacity 2 cannot certify a top-10 over 200 tokens
    ds = ray.data.from_arrow(t).repartition(5)
    with _pytest.raises(ValueError, match="certificate FAILED"):
        heavy_hitters(ds, k=10, capacity=2)


def test_doc_repetition_matches_brute_force():
    """doc_repetition's vectorized n-gram counting == a per-doc Python
    recount, and the batch kernel is blocking-invariant."""
    import collections

    import pandas as pd
    import ray.data

    from leiden_cuda_ray.functions.text import doc_repetition

    rng = np.random.default_rng(5)
    vocab = ["a", "b", "c", "dd", "ee"]
    docs = []
    for i in range(120):
        k = int(rng.integers(0, 12))
        docs.append(" ".join(rng.choice(vocab, k)))
    docs[7] = ""            # empty doc
    docs[11] = "   "        # whitespace-only doc
    t = pa.table({"doc_id": pa.array(np.arange(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})

    def run(n_blocks):
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        return (doc_repetition(ds).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))

    got1, got5 = run(1), run(5)
    pd.testing.assert_frame_equal(got1, got5)

    for i, text in enumerate(docs):
        toks = text.split()
        row = got1.iloc[i]
        assert row.n_tokens == len(toks)
        assert row.n_distinct == len(set(toks))
        bgs = collections.Counter(zip(toks, toks[1:]))
        tgs = collections.Counter(zip(toks, toks[1:], toks[2:]))
        assert row.n_bigrams == sum(bgs.values())
        assert row.top_bigram == (max(bgs.values()) if bgs else 0)
        assert row.n_trigrams == sum(tgs.values())
        assert row.top_trigram == (max(tgs.values()) if tgs else 0)
        want_dup = ((len(toks) - len(set(toks))) / len(toks)
                    if toks else 0.0)
        assert row.dup_frac == want_dup
        want_tb = (max(bgs.values()) / sum(bgs.values())) if bgs else 0.0
        assert row.top_bigram_frac == want_tb


def test_boilerplate_lines_matches_brute_force():
    """boilerplate_lines removes exactly the lines occurring in >=
    min_files distinct docs, rebuilds in order, and is blocking-
    invariant."""
    import collections
    import hashlib

    import pandas as pd
    import ray.data

    from leiden_cuda_ray.functions.text import boilerplate_lines

    common = "import os"
    docs = {
        ("r0", "a.py"): f"{common}\nx = 1\n\nend",
        ("r0", "b.py"): f"{common}\ny = 2\n\nend",
        ("r1", "c.py"): f"{common}\nz = 3\nunique line",
        ("r1", "d.py"): "totally\nunique\ncontent",
        ("r1", "e.py"): f"{common}\n{common}\nsolo",  # dup line in ONE doc
    }
    t = pa.table({
        "repo": pa.array([k[0] for k in docs], pa.string()),
        "path": pa.array([k[1] for k in docs], pa.string()),
        "content": pa.array(list(docs.values()), pa.string()),
    })

    def run(n_blocks):
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        return (boilerplate_lines(ds, min_files=3).to_pandas()
                .sort_values(["repo", "path"]).reset_index(drop=True))

    got1, got3 = run(1), run(3)
    pd.testing.assert_frame_equal(got1, got3)

    # brute force: distinct-file counts per line
    nf = collections.Counter()
    for content in docs.values():
        for line in set(content.split("\n")):
            nf[line] += 1
    frequent = {ln for ln, c in nf.items() if c >= 3}
    assert common in frequent            # shared import removed
    assert "" not in frequent            # blank line in only 2 docs
    for _, row in got1.iterrows():
        content = docs[(row.repo, row.path)]
        lines = content.split("\n")
        kept = [ln for ln in lines if ln not in frequent]
        assert row.n_lines == len(lines)
        assert row.n_removed == len(lines) - len(kept)
        want_sha = hashlib.sha256("\n".join(kept).encode()).hexdigest()
        assert row.cleaned_sha == want_sha
    # e.py: its duplicated common line is removed twice
    e = got1[(got1.repo == "r1") & (got1.path == "e.py")].iloc[0]
    assert e.n_removed == 2


def test_doc_surprisal_matches_brute_force():
    """doc_surprisal's quantized protocol == a direct recount: global
    token counts, q = floor(ln(N/c) * 2^20), per-doc int sum; and the
    two-pass pipeline is blocking-invariant."""
    import collections
    import math

    import pandas as pd
    import ray.data

    from leiden_cuda_ray.functions.text import doc_surprisal

    rng = np.random.default_rng(9)
    vocab = ["aa", "bb", "cc", "dd", "rare"]
    probs = [0.4, 0.3, 0.2, 0.099, 0.001]
    docs = [" ".join(rng.choice(vocab, int(rng.integers(1, 30)), p=probs))
            for _ in range(80)]
    docs[3] = ""
    t = pa.table({"doc_id": pa.array(np.arange(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})

    def run(n_blocks):
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        return (doc_surprisal(ds).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))

    got1, got4 = run(1), run(4)
    pd.testing.assert_frame_equal(got1, got4)

    cnt = collections.Counter(tok for d in docs for tok in d.split())
    n_total = float(sum(cnt.values()))
    q = {tok: math.floor(math.log(n_total / float(c)) * 1048576.0)
         for tok, c in cnt.items()}
    for i, d in enumerate(docs):
        toks = d.split()
        row = got1.iloc[i]
        assert row.n_tokens == len(toks)
        want_sq = sum(q[tok] for tok in toks)
        assert row.surprisal_q == want_sq
        want_avg = (want_sq / 1048576.0 / len(toks)) if toks else 0.0
        assert row.avg_surprisal == want_avg
    # rare tokens must carry more surprisal than common ones
    assert q["rare"] > q["aa"]


def test_bigram_topk_matches_pandas_and_is_blocking_invariant():
    import collections

    import pandas as pd
    import ray.data

    from leiden_cuda_ray.functions.text import bigram_topk

    rng = np.random.default_rng(3)
    vocab = ["x", "y", "zz"]
    rows = [{"doc_id": i, "lang": ["en", "de"][i % 2],
             "text": " ".join(rng.choice(vocab, int(rng.integers(0, 9))))}
            for i in range(100)]
    t = pa.Table.from_pylist(rows)

    def run(n_blocks):
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        return (bigram_topk(ds, k=4).to_pandas()
                .sort_values(["lang", "rnk"]).reset_index(drop=True))

    got1, got7 = run(1), run(7)
    pd.testing.assert_frame_equal(got1, got7)

    cnt = collections.Counter()
    for r in rows:
        toks = r["text"].split()
        for a, b in zip(toks, toks[1:]):
            cnt[(r["lang"], f"{a} {b}")] += 1
    for lang in ["en", "de"]:
        sub = sorted(((g, c) for (lg, g), c in cnt.items() if lg == lang),
                     key=lambda x: (-x[1], x[0]))[:4]
        got = got1[got1.lang == lang]
        assert list(got.bigram) == [g for g, _ in sub]
        assert list(got.tf) == [c for _, c in sub]
        assert list(got.rnk) == [1, 2, 3, 4]


def test_quality_filter_threshold_semantics():
    import pandas as pd
    import ray.data

    from leiden_cuda_ray.functions.text import (
        quality_score,
        quality_threshold_filter,
    )

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    t = pa.Table.from_pandas(docs, preserve_index=False)

    def run(n_blocks, k):
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        return (quality_threshold_filter(ds, k=k).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))

    got1, got6 = run(1, 50), run(6, 50)
    pd.testing.assert_frame_equal(got1, got6)

    all_q = (quality_score(ray.data.from_arrow(t)).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    th = np.sort(all_q.quality.to_numpy())[::-1][49]
    want = all_q[all_q.quality >= th][["doc_id", "quality"]].reset_index(
        drop=True)
    pd.testing.assert_frame_equal(got1, want)
    assert len(got1) >= 50          # ties included


def test_doc_entropy_brute_force_and_blocking_invariant():
    """doc_entropy must equal a direct per-doc computation (counts →
    Σ c·floor(ln(c)·2^20)) and be invariant to block splits (the op is
    per-row, so any blocking must give identical rows)."""
    import math

    from leiden_cuda_ray.functions.text import doc_entropy

    rng = np.random.RandomState(11)
    words = ["a", "bb", "ccc", "dd", "e"]
    rows = [{"doc_id": i,
             "text": " ".join(rng.choice(words, rng.randint(0, 30)))}
            for i in range(40)]
    rows.append({"doc_id": 40, "text": "   "})  # zero tokens
    t = pa.Table.from_pylist(rows)

    def brute(text):
        toks = [w for w in text.split() if w]
        if not toks:
            return 0, 0, 0.0
        cnt = {}
        for w in toks:
            cnt[w] = cnt.get(w, 0) + 1
        n = len(toks)
        ent_q = sum(c * math.floor(math.log(c) * 1048576.0)
                    for c in cnt.values())
        return n, ent_q, math.log(n) - ent_q / 1048576.0 / n

    outs = []
    for blocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(blocks)
        df = (doc_entropy(ds).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
        outs.append(df)
    assert outs[0].equals(outs[1])
    df = outs[0]
    for r in rows:
        n, eq, ent = brute(r["text"])
        got = df[df.doc_id == r["doc_id"]].iloc[0]
        assert int(got.n_tokens) == n and int(got.ent_q) == eq
        # the exact contract is the int column; the float rides along
        # (np.log vs math.log may differ by 1 ulp)
        assert abs(got.entropy - ent) < 1e-9


def test_embedding_centroids_exact_and_blocking_invariant():
    """embedding_centroids must equal direct quantized dimension sums
    at any blocking (int64 partials combine exactly)."""
    from leiden_cuda_ray.functions.similarity import embedding_centroids

    rng = np.random.RandomState(3)
    n, d = 50, 8
    M = rng.randn(n, d).astype(np.float32)
    lab = rng.randint(0, 3, n)
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([row for row in M.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array(lab, pa.int32()),
    })
    q = np.floor(M.astype(np.float64) * 1048576.0).astype(np.int64)
    outs = []
    for blocks in (1, 9):
        ds = ray.data.from_arrow(t).repartition(blocks)
        df = (embedding_centroids(ds).to_pandas()
              .sort_values(["label", "dim"]).reset_index(drop=True))
        outs.append(df)
    assert outs[0].equals(outs[1])
    df = outs[0]
    for L in np.unique(lab):
        sel = q[lab == L]
        for dim in range(d):
            row = df[(df.label == L) & (df.dim == dim + 1)].iloc[0]
            assert int(row.sum_q) == int(sel[:, dim].sum())
            assert int(row.n_vecs) == int((lab == L).sum())


def test_audio_to_samples_exact_roundtrip():
    """AudioToSamples must emit the exact PCM integers that were
    encoded, in order, and audio_energy_stats must equal direct int
    sums (any blocking)."""
    from leiden_cuda_ray.functions.multimodal import (
        AudioToSamples, audio_energy_stats, encode_wav)

    rng = np.random.RandomState(9)
    rows, expect = [], {}
    for i in range(5):
        sig = rng.randint(-32768, 32768, 50 + 30 * i).astype(np.int16)
        rows.append({"media_id": i, "media_type": "audio",
                     "payload": encode_wav(sig, 8000), "meta": "{}"})
        expect[i] = sig.astype(np.int64)
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    samples = ds.map_batches(AudioToSamples(), batch_format="pyarrow",
                             concurrency=1).to_pandas()
    for i, sig in expect.items():
        got = (samples[samples.media_id == i]
               .sort_values("idx")["sample"].to_numpy())
        assert np.array_equal(got, sig)
    stats = (audio_energy_stats(
        ray.data.from_pandas(samples).repartition(4))
        .to_pandas().sort_values("media_id").reset_index(drop=True))
    for i, sig in expect.items():
        r = stats.iloc[i]
        assert int(r.n_samples) == len(sig)
        assert int(r.sum_sq) == int((sig * sig).sum())
        assert int(r.sum_abs) == int(np.abs(sig).sum())


def test_audio_downmix_truncates_toward_zero():
    """Stereo→mono downmix must TRUNCATE (SQL integer-division
    semantics), not numpy-floor: (-3 + 0) / 2 → -1, never -2. Pins the
    decode/downmix step the SQL oracle can't see (it recomputes from
    the written samples)."""
    from leiden_cuda_ray.functions.multimodal import (AudioToSamples,
                                                      encode_wav)

    st = np.array([[-3, 0], [3, 0], [-5, -2], [5, 2], [-1, 0], [0, 0]],
                  np.int16)
    want = np.array([-1, 1, -3, 3, 0, 0], np.int64)  # trunc, not floor
    ds = ray.data.from_arrow(pa.Table.from_pylist(
        [{"media_id": 0, "media_type": "audio",
          "payload": encode_wav(st, 8000), "meta": "{}"}]))
    got = (ds.map_batches(AudioToSamples(), batch_format="pyarrow",
                          concurrency=1).to_pandas()
           .sort_values("idx")["sample"].to_numpy())
    assert np.array_equal(got, want)


def test_fingerprints_vectorized_matches_scalar_reference():
    """The vectorized batch kernel must be bit-identical to the scalar
    winnowing reference (_doc_fingerprint) across short (< window),
    exactly-window, long and empty docs."""
    from leiden_cuda_ray.functions.text import _doc_fingerprint, fingerprints

    rng = np.random.RandomState(21)
    words = ["alpha", "beta", "gamma", "delta", "x", "yy", "zzz"]
    rows = []
    for i in range(60):
        k = [0, 1, 3, 7, 8, 9, 40][i % 7]
        rows.append({"doc_id": i,
                     "text": " ".join(rng.choice(words, k))})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(5)
    got = {r["doc_id"]: r["fingerprint"]
           for r in fingerprints(ds).take_all()}
    for r in rows:
        want = np.uint64(_doc_fingerprint(r["text"])).astype(np.int64)
        assert got[r["doc_id"]] == want, r


def test_pack_sequences_brute_force_and_blocking_invariant():
    """Bin assignment must equal the sequential prefix-sum packing and
    be independent of input blocking (per-block sums + offsets must
    reconstruct the exact global prefix)."""
    from leiden_cuda_ray.functions.packing import pack_sequences

    rng = np.random.RandomState(13)
    rows = [{"doc_id": i,
             "text": " ".join(["w"] * rng.randint(0, 40))}
            for i in range(80)]
    t = pa.Table.from_pylist(rows)
    budget = 64
    outs = []
    for blocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(blocks)
        df = (pack_sequences(ds, budget=budget).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
        outs.append(df)
    assert outs[0].equals(outs[1])
    df = outs[0]
    start = 0
    for r in rows:
        n = len(r["text"].split())
        got = df[df.doc_id == r["doc_id"]].iloc[0]
        assert int(got.n_tokens) == n
        assert int(got.bin) == start // budget
        assert int(got.bin_offset) == start % budget
        start += n


def test_video_frame_stats_closed_form():
    """FrameByteStats must reproduce the generator's closed form:
    pixel (r, c) of frame f in video i is (r*3 + c + 11*f) % 256."""
    from leiden_cuda_ray.functions.multimodal import (
        FrameByteStats, make_real_media_dataset)

    ds = make_real_media_dataset(n=6, media_type="video")
    df = ds.map_batches(FrameByteStats(), batch_format="pyarrow",
                        concurrency=1).to_pandas()
    for i in range(6):
        h, w, nf = 16 + (i % 3) * 8, 16, 4 + i % 3
        sel = df[df.media_id == i]
        assert len(sel) == nf
        for f in range(nf):
            grid = (np.arange(h)[:, None] * 3 + np.arange(w)[None, :]
                    + 11 * f) % 256
            row = sel[sel.frame_index == f].iloc[0]
            assert int(row.n_bytes) == h * w
            assert int(row.sum_bytes) == int(grid.sum())


def test_kmeans_quantized_matches_numpy_and_block_invariant():
    """Bit-exact against a closed-form numpy Lloyd replay, and invariant
    to how rows split into blocks (the partial-combiner contract)."""
    from leiden_cuda_ray.functions.similarity import kmeans_quantized

    rng = np.random.RandomState(7)
    X = np.clip(rng.randn(120, 8) * 0.2, -0.9, 0.9)
    rows = [{"vec_id": i, "embedding": v.tolist()} for i, v in
            enumerate(X)]
    k, iters, scale = 4, 2, 1 << 20

    def ref():
        Xq = np.floor((X + 1.0) * scale).astype(np.int64)
        C = Xq[:k].copy()  # seeds = k smallest vec_ids = first k rows
        for _ in range(iters):
            d2 = ((Xq * Xq).sum(1)[:, None] - 2 * (Xq @ C.T)
                  + (C * C).sum(1)[None, :])
            a = np.argmin(d2, axis=1)
            for c in range(k):
                m = a == c
                if m.any():
                    C[c] = Xq[m].sum(0) // m.sum()
        d2 = ((Xq * Xq).sum(1)[:, None] - 2 * (Xq @ C.T)
              + (C * C).sum(1)[None, :])
        a = np.argmin(d2, axis=1)
        best = d2[np.arange(len(a)), a]
        out = {}
        for c in range(k):
            m = a == c
            out[c] = (int(m.sum()), int(C[c].sum()),
                      int(best[m].sum()))
        return out

    expect = ref()
    for nblocks in (1, 7):
        ds = ray.data.from_arrow(
            pa.Table.from_pylist(rows)).repartition(nblocks)
        got = kmeans_quantized(ds, k=k, iters=iters).to_pandas()
        got = got.sort_values("cid").reset_index(drop=True)
        for c in range(k):
            r = got.iloc[c]
            assert (int(r.n_members), int(r.sum_cq),
                    int(r.inertia)) == expect[c], (c, nblocks)
