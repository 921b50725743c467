"""Driver contract for the graft builder (Ray Data target).

entry(): flagship pipeline (corpus → edges → Leiden + PageRank) on sf0.001.
queries(): one entry per implemented pipeline/operator (SURVEY.md §2).
oracle_sql(): DuckDB-equivalent SQL for each SQL-expressible query; graph
algorithms / hash-based operators are rows-only by design (no entry).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

# corpus parquet path embedded in the oracle SQL (driver compares at sf0.01;
# the queries ensure this file exists deterministically before running) —
# derived from the same helper the Ray pipelines use so they never diverge
from leiden_cuda_ray.sources.corpus import corpus_path_for_sf_dir as _cp

_CORPUS_001 = _cp("/root/testdata/sf0.01")


def entry() -> Any:
    """Flagship: sf0.001 corpus → edge table → Leiden + PageRank scores."""
    import ray

    from leiden_cuda_ray.algorithms.common import state_to_dataset
    from leiden_cuda_ray.algorithms.leiden import leiden
    from leiden_cuda_ray.algorithms.pagerank import pagerank
    from leiden_cuda_ray.config import LeidenConfig
    from leiden_cuda_ray.graph.build import build_graph_from_dataset
    from leiden_cuda_ray.pipelines.derive import derive_edges
    from leiden_cuda_ray.sources.corpus import ensure_corpus_for_sf_dir

    corpus = ensure_corpus_for_sf_dir("/root/testdata/sf0.001")
    edges, numbering, V = derive_edges(corpus, canonical=False)
    graph = build_graph_from_dataset(edges, V,
                                     spill_dir="/tmp/graft_graph/entry")
    comm_refs, info = leiden(graph, LeidenConfig(gamma=0.05))
    ranks, _, _ = pagerank(graph)
    comm_ds = state_to_dataset(graph, comm_refs, "community")
    rank_ds = state_to_dataset(graph, ranks, "pagerank", pa.float64())
    from leiden_cuda_ray.stages.joins import hash_join

    joined = hash_join(comm_ds, rank_ds, on=("vertex",))
    return hash_join(joined, numbering, on=("vertex",))


def queries() -> dict[str, Callable[[str], Any]]:
    from leiden_cuda_ray.functions import dedup, similarity, text
    from leiden_cuda_ray.pipelines import corpus_queries as cq
    from leiden_cuda_ray.pipelines import relational as rel
    from leiden_cuda_ray.pipelines import temporal as tmp

    def _docs(sf_dir):
        import ray.data

        return ray.data.read_parquet(f"{sf_dir}/documents.parquet")

    def _emb(sf_dir):
        import ray.data

        return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")

    def q_train_val_split(sf_dir):
        import ray.data

        from leiden_cuda_ray.functions.sampling import hash_split

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "lang"])
        return hash_split(docs, id_col="doc_id", train_pct=80, seed=42)

    def q_stratified_sample(sf_dir):
        import ray.data

        from leiden_cuda_ray.functions.sampling import stratified_sample

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "lang"])
        return stratified_sample(docs, group_col="lang", id_col="doc_id",
                                 n=25, seed=7)

    def q_weighted_sample(sf_dir):
        import ray.data

        from leiden_cuda_ray.functions.sampling import weighted_sample

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "n_chars"])
        return weighted_sample(docs, weight_col="n_chars",
                               id_col="doc_id", n=100, seed=19)

    def q_doc_repetition(sf_dir):
        return text.doc_repetition(_docs(sf_dir))

    def q_doc_surprisal(sf_dir):
        return text.doc_surprisal(_docs(sf_dir))

    def q_doc_entropy(sf_dir):
        return text.doc_entropy(_docs(sf_dir))

    def q_zipf_sums(sf_dir):
        return text.zipf_sums(_docs(sf_dir), k=100)

    def q_pack_sequences(sf_dir):
        from leiden_cuda_ray.functions.packing import pack_sequences

        return pack_sequences(_docs(sf_dir), budget=2048)

    def q_prepare_corpus(sf_dir):
        """End-to-end LLM training-data prep — the composition a corpus
        pipeline actually runs: exact-dedup keepers ∧ quality ≥ 0.5,
        then contiguous sequence packing of the survivors. Every stage
        is an independently-oracled operator (exact_dedup,
        quality_score, pack_sequences); this query pins the
        COMPOSITION, id-joined with the size-aware hash join."""
        import pyarrow.compute as pc

        from leiden_cuda_ray.functions.dedup import exact_dedup_keepers
        from leiden_cuda_ray.functions.packing import pack_sequences
        from leiden_cuda_ray.stages.joins import hash_join

        docs = _docs(sf_dir)
        keep = exact_dedup_keepers(docs)

        def qpass(batch):
            m = pc.greater_equal(batch.column("quality"), 0.5)
            return batch.filter(m).select(["doc_id"])

        qids = text.quality_score(docs).map_batches(
            qpass, batch_format="pyarrow", zero_copy_batch=True)
        eligible = hash_join(keep, qids, on=["doc_id"])
        kept_docs = hash_join(docs.select_columns(["doc_id", "text"]),
                              eligible, on=["doc_id"])
        return pack_sequences(kept_docs, budget=2048)

    def q_embedding_centroids(sf_dir):
        return similarity.embedding_centroids(_emb(sf_dir))

    def q_embedding_quantize(sf_dir):
        return similarity.embedding_quantize(_emb(sf_dir))

    def q_docs_global_rank(sf_dir):
        # distributed TOTAL-ORDER rank: Ray's range-partitioned sort
        # orders the blocks, zip_with_index assigns dense global ranks
        # from per-block row counts only (nothing row-sized reaches the
        # driver) — the same machinery the vertex numbering is built on
        import pyarrow as pa
        import ray.data

        from leiden_cuda_ray.stages.numbering import zip_with_index

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "n_chars"])
        ranked, _n = zip_with_index(
            docs.sort(["n_chars", "doc_id"], descending=[True, False]),
            "rnk0")

        def bump(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({
                "doc_id": batch.column("doc_id"),
                "n_chars": batch.column("n_chars"),
                "rnk": pc.add(batch.column("rnk0"),
                              pa.scalar(1, pa.int64())),
            })

        return ranked.map_batches(bump, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def q_boilerplate(sf_dir):
        from leiden_cuda_ray.sources.corpus import (
            ensure_corpus_for_sf_dir,
            read_corpus,
        )

        corpus = read_corpus(ensure_corpus_for_sf_dir(sf_dir),
                             columns=["repo", "path", "content"])
        return text.boilerplate_lines(corpus, min_files=3)

    def q_exact_dedup(sf_dir):
        return dedup.exact_dedup_keepers(_docs(sf_dir))

    def q_doc_stats(sf_dir):
        return text.token_stats(_docs(sf_dir))

    def q_doc_stats_jsonl(sf_dir):
        # JSONL round trip: same token_stats pipeline, same oracle SQL
        # as doc_stats — the wire format is what's being checked
        from leiden_cuda_ray.sources.interchange import (
            read_documents_jsonl)

        return text.token_stats(read_documents_jsonl(sf_dir))

    def q_events_hourly_csv(sf_dir):
        # CSV round trip: hourly event count + exact cent sums computed
        # from the CSV copy; the oracle reads the parquet original
        from leiden_cuda_ray.sources.interchange import read_events_csv

        ev = read_events_csv(sf_dir)

        def hourly(batch: pa.Table) -> pa.Table:
            import numpy as np
            import pyarrow.compute as pc

            ts = (np.asarray(batch.column("ts"), "datetime64[us]")
                  .view("int64"))
            hour = ts - ts % 3_600_000_000
            v_c = np.rint(np.asarray(batch.column("value"),
                                     np.float64) * 100.0).astype("int64")
            u, inv = np.unique(hour, return_inverse=True)
            s = np.zeros(len(u), dtype="int64")
            np.add.at(s, inv, v_c)
            cnt = np.bincount(inv, minlength=len(u)).astype("int64")
            return pa.table({
                "hour": pa.array(u.view("datetime64[us]"),
                                 pa.timestamp("us")),
                "n_events": pa.array(cnt, pa.int64()),
                "value_c": pa.array(s, pa.int64()),
            })

        from ray.data.aggregate import Sum

        agg = (ev.map_batches(hourly, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby("hour").aggregate(
                   Sum("n_events", alias_name="n_events"),
                   Sum("value_c", alias_name="value_c")))

        def fix(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({
                "hour": pc.cast(batch.column("hour"), pa.timestamp("us")),
                "n_events": pc.cast(batch.column("n_events"), pa.int64()),
                "value_c": pc.cast(batch.column("value_c"), pa.int64()),
            })

        return agg.map_batches(fix, batch_format="pyarrow")

    def q_bpe_tokens(sf_dir):
        return text.bpe_token_count(_docs(sf_dir))

    def q_vocab_topk(sf_dir):
        return text.vocab_topk(_docs(sf_dir))

    def q_vocab_editdist(sf_dir):
        # over the corpus CONTENT vocabulary (the driver documents table's
        # fixed ~40-word vocabulary has no distance-1 pairs at any sf)
        from leiden_cuda_ray.sources.corpus import (
            ensure_corpus_for_sf_dir,
            read_corpus,
        )

        corpus = read_corpus(ensure_corpus_for_sf_dir(sf_dir),
                             columns=["content"])
        return text.vocab_editdist_pairs(corpus, column="content")

    def q_tfidf_topk(sf_dir):
        return text.tfidf_topk(_docs(sf_dir))

    def q_bigram_topk(sf_dir):
        return text.bigram_topk(_docs(sf_dir))

    def q_quality_filter(sf_dir):
        return text.quality_threshold_filter(_docs(sf_dir))

    def q_decontaminate(sf_dir):
        return dedup.cross_split_overlap(_docs(sf_dir))

    def q_redact(sf_dir):
        # over the CORPUS (content has numeric identifiers to scrub);
        # the documents table is digit-free, which would make the
        # transform vacuous
        from leiden_cuda_ray.sources.corpus import (
            ensure_corpus_for_sf_dir,
            read_corpus,
        )

        corpus = read_corpus(ensure_corpus_for_sf_dir(sf_dir),
                             columns=["repo", "path", "content"])
        return text.redact_text(corpus, id_cols=("repo", "path"),
                                text_col="content")

    def q_language_id(sf_dir):
        return text.language_id(_docs(sf_dir)).select_columns(
            ["doc_id", "lang_pred"])

    def q_quality(sf_dir):
        return text.quality_score(_docs(sf_dir))

    def q_fingerprints(sf_dir):
        return text.fingerprints(_docs(sf_dir))

    def q_simhash(sf_dir):
        return dedup.simhash(_docs(sf_dir))

    def q_minhash_pairs(sf_dir):
        sigs = dedup.minhash_signatures(_docs(sf_dir))
        return dedup.lsh_candidate_pairs(sigs, threshold=0.5).select_columns(
            ["doc_a", "doc_b"])

    def q_minhash_consistency(sf_dir):
        """Written-artifact recompute oracle for the MinHash/LSH path
        (VERDICT r3 item 4): the signature table and the LSH candidate
        pairs are written to parquet, and the engine returns per-pair
        EXACT signature-match counts (est_jaccard·num_perm is an exact
        integer). DuckDB recomputes the identical counts from the written
        files — any drift between banding, the estimate path and the
        signatures breaks the hash compare loudly."""
        from leiden_cuda_ray.pipelines.corpus_queries import _write_partition

        sigs = dedup.minhash_signatures(_docs(sf_dir)).materialize()
        pairs = dedup.lsh_candidate_pairs(sigs, threshold=0.5).materialize()
        _write_partition(sf_dir, sigs, "minhash_sigs")
        _write_partition(
            sf_dir,
            pairs.map_batches(
                lambda t: pa.table({"doc_a": t.column("doc_a"),
                                    "doc_b": t.column("doc_b")}),
                batch_format="pyarrow"),
            "minhash_pairs")

        def to_matches(batch: pa.Table) -> pa.Table:
            est = np.asarray(batch.column("est_jaccard"), np.float64)
            return pa.table({
                "doc_a": batch.column("doc_a"),
                "doc_b": batch.column("doc_b"),
                "matches": pa.array(np.rint(est * 64).astype(np.int64),
                                    pa.int64()),
            })

        return pairs.map_batches(to_matches, batch_format="pyarrow")

    def q_simhash_pairs(sf_dir):
        """Written-artifact recompute oracle for the SimHash banded
        pairing: the 64-bit simhashes are written to parquet and the
        engine returns its banded Hamming≤3 pairs; DuckDB recomputes the
        identical pair set from the written hashes (4×16-bit banding +
        popcount-of-xor), machine-checking the band bucketing, in-bucket
        pairing, Hamming arithmetic and cross-band distinct. Only the
        blake2b token hashing itself stays rows-only (`simhash`)."""
        from leiden_cuda_ray.pipelines.corpus_queries import _write_partition

        sims = dedup.simhash(_docs(sf_dir)).materialize()
        _write_partition(sf_dir, sims, "simhash_sigs")
        return dedup.simhash_dup_pairs(sims, max_hamming=3)

    def q_embedding_dups_consistency(sf_dir):
        """False-positive check for the hyperplane-LSH near-dup path: the
        emitted pair ids are written to parquet; DuckDB re-reads them,
        joins the raw embeddings and keeps the pairs whose EXACT cosine
        clears the threshold — a pair the bucketing / normalization / dot
        product got wrong drops out and fails the row compare."""
        from leiden_cuda_ray.pipelines.corpus_queries import _write_partition

        pairs = dedup.embedding_dup_pairs(_emb(sf_dir), threshold=0.45)

        def ids_only(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({
                "vec_a": pc.cast(batch.column("vec_a"), pa.int64()),
                "vec_b": pc.cast(batch.column("vec_b"), pa.int64()),
            })

        ids = pairs.map_batches(ids_only,
                                batch_format="pyarrow").materialize()
        _write_partition(sf_dir, ids, "embedding_dup_pairs")
        return ids

    def q_distinct_kmv(sf_dir):
        """KMV distinct-count sketch over event user_ids with an exact
        integer estimation protocol — the oracle replays hash, k-th
        minimum and the HUGEINT division bit-for-bit, and the exact
        distinct count rides along as the accuracy reference
        (functions/sampling.py::kmv_distinct)."""
        import ray.data

        from leiden_cuda_ray.functions.sampling import kmv_distinct

        ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["user_id"])
        return kmv_distinct(ev, id_col="user_id", k=64, seed=101)

    def q_distinct_hll(sf_dir):
        """HyperLogLog distinct-count sketch over event user_ids — the
        mergeable-register sibling of distinct_kmv; the oracle replays
        hash, register index, leading-zero rank, the 2^62-scaled exact
        register sum and both estimator branches bit-for-bit
        (functions/sampling.py::hll_distinct)."""
        import ray.data

        from leiden_cuda_ray.functions.sampling import hll_distinct

        ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["user_id"])
        return hll_distinct(ev, id_col="user_id", b=5, seed=131)

    def q_distinct_hll_by_type(sf_dir):
        """Per-group HyperLogLog: distinct users per event type, one
        register bank per group, identical pinned protocol
        (functions/sampling.py::hll_distinct_grouped)."""
        import ray.data

        from leiden_cuda_ray.functions.sampling import hll_distinct_grouped

        ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["event_type", "user_id"])
        return hll_distinct_grouped(ev, b=5, seed=131)

    def q_heavy_hitters(sf_dir):
        """Exact global top-40 tokens via a Misra-Gries candidate sketch
        + exact verify pass; the engine's certificate (k-th exact count
        > accumulated sketch undercount) guarantees equality with the
        oracle's plain wordcount — a failed certificate raises instead
        of returning an approximation (functions/text.py::heavy_hitters)."""
        from leiden_cuda_ray.functions.text import heavy_hitters

        return heavy_hitters(_docs(sf_dir), k=40, capacity=512)

    def q_dup_clusters(sf_dir):
        """Near-dup CLUSTER assignment: connected components over the
        near-dup pair stream, cluster = min vec_id in the mutual-dup
        component, keeper = 1 for that minimum (the row dedup would
        retain). The pair stream here is the exact brute-force join so
        the whole composition is oracle-checkable; at scale the same
        components_from_pairs runs over the LSH pair stream
        (functions/dedup.py::embedding_dup_pairs)."""
        import pyarrow.compute as pc

        from leiden_cuda_ray.algorithms.scc import components_from_pairs
        from leiden_cuda_ray.stages.joins import hash_join

        emb = _emb(sf_dir)
        pairs = dedup.embedding_dup_pairs_exact(emb, threshold=0.45)

        def to_sd(batch: pa.Table) -> pa.Table:
            return pa.table({
                "src": pc.cast(batch.column("vec_a"), pa.int64()),
                "dst": pc.cast(batch.column("vec_b"), pa.int64()),
            })

        ids = emb.select_columns(["vec_id"])
        V = int(ids.max("vec_id")) + 1
        labels = components_from_pairs(
            pairs.map_batches(to_sd, batch_format="pyarrow"), V)
        # inner-join onto the real id set: correct even if vec_id were
        # sparse (labels emits every id in [0, V))
        j = hash_join(labels, ids, on=("vertex",), right_on=("vec_id",))

        def fin(batch: pa.Table) -> pa.Table:
            v = np.asarray(batch.column("vertex"), np.int64)
            c = np.asarray(batch.column("component"), np.int64)
            return pa.table({
                "vec_id": pa.array(v, pa.int64()),
                "cluster": pa.array(c, pa.int64()),
                "keeper": pa.array((v == c).astype(np.int64), pa.int64()),
            })

        return j.map_batches(fin, batch_format="pyarrow")

    def q_embedding_dups(sf_dir):
        # testdata embeddings have no true near-dups (max cosine ≈ 0.51);
        # 0.45 surfaces the same-cluster "near" pairs. The arrow projection
        # keeps a typed schema even for empty results.
        pairs = dedup.embedding_dup_pairs(_emb(sf_dir), threshold=0.45)

        def proj(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "vec_a" not in batch.column_names:
                return pa.table({"vec_a": pa.array([], pa.int64()),
                                 "vec_b": pa.array([], pa.int64())})
            import pyarrow.compute as pc

            return pa.table({
                "vec_a": pc.cast(batch.column("vec_a"), pa.int64()),
                "vec_b": pc.cast(batch.column("vec_b"), pa.int64()),
            })

        return pairs.map_batches(proj, batch_format="pyarrow")

    def q_embedding_dups_exact(sf_dir):
        # same 0.45 threshold as the LSH variant; exact brute-force join is
        # the oracle-checkable baseline for it
        return dedup.embedding_dup_pairs_exact(_emb(sf_dir), threshold=0.45)

    def _first10_queries(sf_dir):
        def keep(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.less(batch.column("vec_id"), 10))

        rows = sorted(
            _emb(sf_dir).map_batches(keep, batch_format="pyarrow",
                                     zero_copy_batch=True).take_all(),
            key=lambda r: r["vec_id"])
        return np.stack([np.asarray(r["embedding"], np.float64)
                         for r in rows])

    def q_kmeans(sf_dir):
        return similarity.kmeans_quantized(_emb(sf_dir), k=8, iters=2)

    def q_knn(sf_dir):
        Q = _first10_queries(sf_dir)
        res = similarity.knn_brute(_emb(sf_dir), Q, k=5)

        def fix(batch: pa.Table) -> pa.Table:
            return pa.table({
                "query_id": batch.column("query_id"),
                "neighbor_id": batch.column("neighbor_id"),
                "rank": batch.column("rank"),
            })

        return res.map_batches(fix, batch_format="pyarrow")

    def q_media_decode(sf_dir):
        # No media in the parquet tiers: decode a deterministic synthetic
        # table of REAL PPM payloads (closed-form per-id geometry) through
        # the actor-pool decoder; the oracle recomputes the geometry from
        # the generative formula without running the decoder.
        from leiden_cuda_ray.functions import multimodal as mm

        ds = mm.make_real_media_dataset(n=64, media_type="image")
        return mm.decode_images(ds, concurrency=2, batch_size=16,
                                fake=False).select_columns(
                                    ["media_id", "height", "width",
                                     "channels"])

    def q_audio_energy(sf_dir):
        # Written-artifact recompute oracle (the minhash_consistency
        # pattern): the actor-pool WAV decode emits the EXACT stored PCM
        # integers to parquet; the engine returns per-media integer
        # energy sums and DuckDB recomputes the identical BIGINTs from
        # the written samples.
        from leiden_cuda_ray.functions import multimodal as mm
        from leiden_cuda_ray.pipelines.corpus_queries import (
            _write_partition)

        ds = mm.make_real_media_dataset(n=64, media_type="audio")
        samples = ds.map_batches(mm.AudioToSamples(), concurrency=2,
                                 batch_size=16,
                                 batch_format="pyarrow").materialize()
        _write_partition(sf_dir, samples, "audio_samples")
        return mm.audio_energy_stats(samples)

    def q_video_frame_stats(sf_dir):
        # Third-modality oracle: decode REAL y4m video through the
        # actor pool and emit per-frame exact byte sums; the oracle
        # recomputes them from the generator's closed form
        # ((r·3 + c + 11·f) mod 256) without running the decoder.
        from leiden_cuda_ray.functions import multimodal as mm

        ds = mm.make_real_media_dataset(n=64, media_type="video")
        return ds.map_batches(mm.FrameByteStats(), concurrency=2,
                              batch_size=16, batch_format="pyarrow")

    def q_knn_ivf(sf_dir):
        Q = _first10_queries(sf_dir)
        res = similarity.knn_ivf(_emb(sf_dir), Q, k=5, n_centroids=8,
                                 n_probe=3)
        return res.map_batches(
            lambda t: pa.table({"query_id": t.column("query_id"),
                                "neighbor_id": t.column("neighbor_id"),
                                "rank": t.column("rank")}),
            batch_format="pyarrow")

    def q_knn_ivf_recall(sf_dir):
        """Written-artifact recompute oracle for IVF ANN (VERDICT r3
        item 4): the IVF top-k is written to parquet and the engine
        returns (queries, pairs, exact_hits), exact_hits counting IVF
        pairs present in the engine's exact brute-force top-k. DuckDB
        recomputes the identical scalars from the written file joined to
        its own independent brute-force ranking (the knn_brute oracle
        SQL), so both the recall arithmetic and the exact ranking are
        cross-checked."""
        import ray.data

        from leiden_cuda_ray.pipelines.corpus_queries import _write_partition

        Q = _first10_queries(sf_dir)
        ivf = similarity.knn_ivf(_emb(sf_dir), Q, k=5, n_centroids=8,
                                 n_probe=3).map_batches(
            lambda t: pa.table({"query_id": t.column("query_id"),
                                "neighbor_id": t.column("neighbor_id")}),
            batch_format="pyarrow").materialize()
        _write_partition(sf_dir, ivf, "knn_ivf")
        brute = similarity.knn_brute(_emb(sf_dir), Q, k=5)
        # k × n_queries rows — bounded at any sf, driver-side set ops fine
        ivf_rows = {(r["query_id"], r["neighbor_id"])
                    for r in ivf.take_all()}
        exact_rows = {(r["query_id"], r["neighbor_id"])
                      for r in brute.take_all()}
        return ray.data.from_arrow(pa.table({
            "queries": pa.array([len({q for q, _ in ivf_rows})], pa.int64()),
            "pairs": pa.array([len(ivf_rows)], pa.int64()),
            "exact_hits": pa.array([len(ivf_rows & exact_rows)], pa.int64()),
        }))

    return {
        # relational operator surface (TPC-H-ish tables)
        "pricing_summary": rel.pricing_summary,
        "top_customers": rel.top_customers,
        "nation_order_counts": rel.nation_order_counts,
        "region_revenue": rel.region_revenue,
        "rollup_revenue": rel.rollup_revenue,
        "customers_no_big_order": rel.customers_without_orders,
        "funnel_stages": rel.funnel_stages,
        "price_histogram": rel.price_histogram,
        "bloom_semijoin": rel.bloom_semijoin_revenue,
        "daily_running_revenue": rel.daily_running_revenue,
        "pareto_parts": rel.pareto_parts,
        "priority_value_variance": rel.priority_value_variance,
        "lineitem_corr": rel.lineitem_corr,
        "user_mode_event": rel.user_mode_event,
        "daily_new_users": rel.daily_new_users,
        "priority_price_quartiles": rel.priority_price_quartiles,
        "parts_churn": rel.parts_churn,
        "above_segment_avg": rel.above_segment_avg,
        "brand_item_counts": rel.brand_item_counts,
        "high_value_orders": rel.high_value_orders,
        "distinct_segments": rel.distinct_segments,
        "supplier_balance_by_nation": rel.supplier_balance_by_nation,
        "part_type_stats": rel.part_type_stats,
        "events_hourly": rel.events_hourly,
        "events_json_stats": rel.events_json_stats,
        "sessionize_events": rel.sessionize_events,
        "top_docs_per_group": rel.top_docs_per_group,
        "event_attribution": tmp.event_attribution,
        "events_rolling": tmp.events_rolling,
        "events_interarrival": tmp.events_interarrival,
        "segment_order_percentiles": tmp.segment_order_percentiles,
        "asof_price_index": tmp.asof_price_index,
        "sliding_median3": tmp.sliding_median3,
        "latest_events": tmp.latest_event_compaction,
        "event_intervals": tmp.event_validity_intervals,
        "ship_window_counts": rel.ship_window_counts,
        "customer_event_outer": rel.customer_event_outer,
        "order_deciles": rel.order_deciles,
        "nation_top_names": rel.nation_top_names,
        "order_lines_enriched": rel.order_lines_enriched,
        "docs_dense_topk": rel.docs_dense_topk,
        "parts_intersect": rel.parts_intersect,
        "lineitem_melt": rel.lineitem_melt,
        "orders_cube": rel.orders_cube,
        "orders_profile": rel.orders_profile,
        "events_range_window": tmp.events_range_window,
        # documents / embeddings operators
        "train_val_split": q_train_val_split,
        "stratified_sample": q_stratified_sample,
        "weighted_sample": q_weighted_sample,
        "doc_repetition": q_doc_repetition,
        "doc_surprisal": q_doc_surprisal,
        "doc_entropy": q_doc_entropy,
        "embedding_centroids": q_embedding_centroids,
        "embedding_quantize": q_embedding_quantize,
        "pack_sequences": q_pack_sequences,
        "prepare_corpus": q_prepare_corpus,
        "events_hopping": rel.events_hopping,
        "distinct_users_by_type": rel.distinct_users_by_type,
        "zipf_sums": q_zipf_sums,
        "lineitem_ols": rel.lineitem_ols,
        "orders_status_pivot": rel.orders_status_pivot,
        "retention_cohorts": rel.retention_cohorts,
        "event_type_pairs": rel.event_type_pairs,
        "docs_global_rank": q_docs_global_rank,
        "boilerplate_lines": q_boilerplate,
        "exact_dedup": q_exact_dedup,
        "doc_stats": q_doc_stats,
        "doc_stats_jsonl": q_doc_stats_jsonl,
        "events_hourly_csv": q_events_hourly_csv,
        "bpe_tokens": q_bpe_tokens,
        "vocab_topk": q_vocab_topk,
        "vocab_editdist": q_vocab_editdist,
        "tfidf_topk": q_tfidf_topk,
        "bigram_topk": q_bigram_topk,
        "quality_filter": q_quality_filter,
        "redact_text": q_redact,
        "decontaminate": q_decontaminate,
        "language_id": q_language_id,
        "quality_score": q_quality,
        "fingerprints": q_fingerprints,
        "simhash": q_simhash,
        "minhash_pairs": q_minhash_pairs,
        "minhash_consistency": q_minhash_consistency,
        "simhash_pairs_consistency": q_simhash_pairs,
        "embedding_dups": q_embedding_dups,
        "embedding_dups_exact": q_embedding_dups_exact,
        "dup_clusters": q_dup_clusters,
        "heavy_hitters": q_heavy_hitters,
        "distinct_kmv": q_distinct_kmv,
        "distinct_hll": q_distinct_hll,
        "distinct_hll_by_type": q_distinct_hll_by_type,
        "embedding_dups_consistency": q_embedding_dups_consistency,
        "knn_brute": q_knn,
        "knn_ivf": q_knn_ivf,
        "kmeans_quantized": q_kmeans,
        "knn_ivf_recall": q_knn_ivf_recall,
        "media_decode": q_media_decode,
        "audio_energy": q_audio_energy,
        "video_frame_stats": q_video_frame_stats,
        # corpus pipeline + graph algorithms
        "corpus_sha256": cq.corpus_sha256,
        "cocommit_pairs": cq.cocommit_pairs,
        "import_pairs": cq.import_pairs,
        "degree_topk": cq.degree_topk,
        "graph_pagerank": cq.graph_pagerank,
        "graph_pagerank_fixed": cq.graph_pagerank_fixed,
        "graph_components": cq.graph_components,
        "graph_hits": cq.graph_hits,
        "graph_bfs": cq.graph_bfs,
        "graph_sssp": cq.graph_sssp,
        "graph_diameter": cq.graph_diameter,
        "graph_tri_support": cq.graph_tri_support,
        "graph_clustering": cq.graph_clustering,
        "graph_jaccard": cq.graph_jaccard_edges,
        "graph_adamic_adar": cq.graph_adamic_adar,
        "graph_walks": cq.graph_walks,
        "graph_scc": cq.graph_scc,
        "graph_import_depth": cq.graph_import_depth,
        "graph_mis": cq.graph_mis,
        "graph_coloring": cq.graph_coloring,
        "graph_reciprocity": cq.graph_reciprocity,
        "graph_matching": cq.graph_matching,
        "graph_spcount": cq.graph_spcount,
        "graph_betweenness": cq.graph_betweenness,
        "graph_harmonic": cq.graph_harmonic,
        "graph_eccentricity": cq.graph_eccentricity,
        "graph_weight_hist": cq.graph_weight_hist,
        "graph_degree_hist": cq.graph_degree_hist,
        "graph_ktruss": cq.graph_ktruss,
        "graph_ppr": cq.graph_ppr,
        "graph_assortativity": cq.graph_assortativity,
        "repo_pagerank": cq.repo_pagerank,
        "graph_labelprop": cq.graph_labelprop,
        "graph_kcore": cq.graph_kcore,
        "graph_triangles": cq.graph_triangles,
        "graph_clustering_coef": cq.graph_clustering_coef,
        "graph_leiden": cq.graph_leiden,
        "graph_louvain": cq.graph_louvain,
        # objective-recompute invariants: write the partition, return the
        # exact-integer objective; the oracle recomputes it from the file
        "graph_leiden_objective": cq.graph_leiden_objective,
        "graph_leiden_conductance": cq.graph_leiden_conductance,
        "graph_louvain_objective": cq.graph_louvain_objective,
        "partition_rand_index": cq.partition_rand_index,
    }


# --------------------------------------------------------------- oracles ----

_CORPUS_CTE = f"""
corpus AS (SELECT * FROM read_parquet('{_CORPUS_001}')),
files AS (
  SELECT DISTINCT repo, path,
         regexp_extract(path, '([^/]+)\\.[^.]*$', 1) AS stem
  FROM corpus),
imp_stmts AS (
  SELECT repo AS src_repo, path AS src_path, lang, stmt
  FROM (
    SELECT repo, path, lang,
           unnest(regexp_extract_all(content,
             CASE lang
               WHEN 'python' THEN 'from (\\w+)\\.(\\w+) import'
               WHEN 'c'      THEN '#include "(\\w+)/(\\w+)\\.h"'
               ELSE 'require\\("(\\w+)/(\\w+)"\\)'
             END)) AS stmt
    FROM corpus)),
imp_targets AS (
  SELECT src_repo, src_path,
         regexp_extract(stmt, '(\\w+)[./]', 1) AS dst_repo,
         CASE lang
           WHEN 'python' THEN regexp_extract(stmt, '\\.(\\w+) import', 1)
           WHEN 'c'      THEN regexp_extract(stmt, '/(\\w+)\\.h', 1)
           ELSE               regexp_extract(stmt, '/(\\w+)"', 1)
         END AS dst_stem
  FROM imp_stmts),
import_edges AS (
  SELECT DISTINCT t.src_repo, t.src_path, f.repo AS dst_repo,
         f.path AS dst_path
  FROM imp_targets t
  JOIN files f ON f.repo = t.dst_repo AND f.stem = t.dst_stem),
cocommit_edges AS (
  SELECT a.repo AS src_repo, a.path AS src_path,
         b.repo AS dst_repo, b.path AS dst_path, COUNT(*) AS weight
  FROM corpus a JOIN corpus b
    ON a.repo = b.repo AND a."commit" = b."commit" AND a.path < b.path
  GROUP BY 1, 2, 3, 4),
all_pairs AS (
  SELECT src_repo, src_path, dst_repo, dst_path FROM import_edges
  UNION ALL
  SELECT src_repo, src_path, dst_repo, dst_path FROM cocommit_edges),
canon AS (
  SELECT DISTINCT
    LEAST(src_repo || '|' || src_path, dst_repo || '|' || dst_path)
      AS key_a,
    GREATEST(src_repo || '|' || src_path, dst_repo || '|' || dst_path)
      AS key_b
  FROM all_pairs)
"""


def _kmeans_sql(k: int = 8, iters: int = 2, scale: int = 1 << 20) -> str:
    """Unrolled Lloyd k-means over the embeddings table in the engine's
    exact-integer protocol (functions/similarity.py::kmeans_quantized):
    xq = FLOOR((x+1)·2^20) (positive, so // is floor on both sides),
    integer squared distances, argmin ties to the lowest cid, centroid
    update cq = Σxq // n with empty clusters keeping their previous
    centroid — every iteration replayed as BIGINTs, the iterative-ML
    analogue of the unrolled power-iteration oracle."""
    parts = [f"""
WITH q AS (
  SELECT vec_id, dim - 1 AS dim,
         CAST(FLOOR((CAST(x AS DOUBLE) + 1.0) * {scale}) AS BIGINT) AS xq
  FROM (SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS dim
        FROM embeddings)),
seeds AS (SELECT vec_id,
                 CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT)
                   AS cid
          FROM (SELECT vec_id FROM embeddings
                ORDER BY vec_id LIMIT {k})),
c0 AS (SELECT s.cid, q.dim, q.xq AS cq
       FROM seeds s JOIN q USING (vec_id))"""]
    for i in range(1, iters + 1):
        parts.append(f""",
d{i} AS (SELECT q.vec_id, c.cid,
               SUM((q.xq - c.cq) * (q.xq - c.cq)) AS d2
        FROM q JOIN c{i - 1} c USING (dim) GROUP BY 1, 2),
a{i} AS (SELECT vec_id, cid FROM (
          SELECT vec_id, cid,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY d2, cid) AS rn
          FROM d{i}) WHERE rn = 1),
s{i} AS (SELECT a.cid, q.dim, SUM(q.xq) AS sq,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM q JOIN a{i} a USING (vec_id) GROUP BY 1, 2),
c{i} AS (SELECT p.cid, p.dim,
               COALESCE(CAST(s.sq // s.n AS BIGINT), p.cq) AS cq
        FROM c{i - 1} p LEFT JOIN s{i} s
          ON s.cid = p.cid AND s.dim = p.dim)""")
    f = iters + 1
    parts.append(f""",
d{f} AS (SELECT q.vec_id, c.cid,
               SUM((q.xq - c.cq) * (q.xq - c.cq)) AS d2
        FROM q JOIN c{iters} c USING (dim) GROUP BY 1, 2),
a{f} AS (SELECT vec_id, cid, d2 FROM (
          SELECT vec_id, cid, d2,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY d2, cid) AS rn
          FROM d{f}) WHERE rn = 1),
g AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d2) AS BIGINT) AS inertia
      FROM a{f} GROUP BY 1)
SELECT c.cid, COALESCE(g.n, 0) AS n_members, c.sum_cq,
       COALESCE(g.inertia, 0) AS inertia
FROM (SELECT cid, CAST(SUM(cq) AS BIGINT) AS sum_cq
      FROM c{iters} GROUP BY 1) c
LEFT JOIN g USING (cid)""")
    return "".join(parts)


def _pagerank_fixed_sql(iters: int = 15, alpha: float = 0.85) -> str:
    """Unrolled weighted power iteration (the engine's pagerank semantics:
    r'_v = (1-α)/V + α(Σ_u r_u·w/wdeg_u + dangling/V)) — each step
    MATERIALIZED so the doubly-referenced chain doesn't inline
    exponentially. Matches graph_pagerank_fixed to ~2e-18 before rounding."""
    steps = []
    for k in range(iters):
        steps.append(f"""
r{k + 1} AS MATERIALIZED (
  SELECT vid.v AS v,
         (1 - {alpha}) / (SELECT V FROM nv)
         + {alpha} * (COALESCE(c.s, 0)
            + (SELECT COALESCE(SUM(p.r), 0) FROM r{k} p
               LEFT JOIN wdeg dd ON dd.u = p.v WHERE dd.u IS NULL)
              / (SELECT V FROM nv)) AS r
  FROM vid
  LEFT JOIN (SELECT s.t AS v, SUM(p.r * s.w / d.d) AS s
             FROM r{k} p JOIN wdeg d ON d.u = p.v JOIN sym s ON s.u = p.v
             GROUP BY s.t) c ON c.v = vid.v)""")
    return f"""WITH {_CORPUS_CTE},
vid AS MATERIALIZED (SELECT repo || '|' || path AS key,
        ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v FROM files),
wpair AS (
  SELECT src_repo||'|'||src_path AS ks, dst_repo||'|'||dst_path AS kd,
         CAST(1 AS DOUBLE) AS w FROM import_edges
  UNION ALL
  SELECT src_repo||'|'||src_path, dst_repo||'|'||dst_path,
         CAST(weight AS DOUBLE) FROM cocommit_edges),
wedge AS (SELECT LEAST(ks, kd) AS ka, GREATEST(ks, kd) AS kb, SUM(w) AS w
          FROM wpair GROUP BY 1, 2),
sym AS MATERIALIZED (
  SELECT va.v AS u, vb.v AS t, w FROM wedge
    JOIN vid va ON va.key = ka JOIN vid vb ON vb.key = kb
  UNION ALL
  SELECT vb.v, va.v, w FROM wedge
    JOIN vid va ON va.key = ka JOIN vid vb ON vb.key = kb),
nv AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS V FROM vid),
wdeg AS MATERIALIZED (SELECT u, SUM(w) AS d FROM sym GROUP BY u),
r0 AS MATERIALIZED (SELECT v, 1.0 / (SELECT V FROM nv) AS r FROM vid),
{','.join(steps)}
SELECT v AS vertex, ROUND(r, 6) AS pagerank FROM r{iters}"""


def _repo_pagerank_sql(iters: int = 15, alpha: float = 0.85) -> str:
    """Unrolled weighted power iteration over the REPO dependency graph
    (corpus_queries.py::repo_pagerank): repo ids = rank in sorted repo
    order, edge weight = distinct file-level import pairs between the
    repos (self-dependencies dropped), symmetrized with canonical
    weight merging — the identical construction the engine's
    build_graph_from_dataset performs on the aggregated pair stream."""
    steps = []
    for k in range(iters):
        steps.append(f"""
r{k + 1} AS MATERIALIZED (
  SELECT rp.rid AS v,
         (1 - {alpha}) / (SELECT R FROM nr)
         + {alpha} * (COALESCE(c.s, 0)
            + (SELECT COALESCE(SUM(p.r), 0) FROM r{k} p
               LEFT JOIN wdeg dd ON dd.u = p.v WHERE dd.u IS NULL)
              / (SELECT R FROM nr)) AS r
  FROM repos rp
  LEFT JOIN (SELECT s.t AS v, SUM(p.r * s.w / d.d) AS s
             FROM r{k} p JOIN wdeg d ON d.u = p.v JOIN sym s ON s.u = p.v
             GROUP BY s.t) c ON c.v = rp.rid)""")
    return f"""WITH {_CORPUS_CTE},
repos AS MATERIALIZED (
  SELECT repo, DENSE_RANK() OVER (ORDER BY repo) - 1 AS rid
  FROM (SELECT DISTINCT repo FROM corpus)),
redge AS (
  SELECT ra.rid AS u, rb.rid AS t, CAST(COUNT(*) AS DOUBLE) AS w
  FROM import_edges e
  JOIN repos ra ON ra.repo = e.src_repo
  JOIN repos rb ON rb.repo = e.dst_repo
  WHERE e.src_repo <> e.dst_repo GROUP BY 1, 2),
wedge AS (SELECT LEAST(u, t) AS ka, GREATEST(u, t) AS kb, SUM(w) AS w
          FROM redge GROUP BY 1, 2),
sym AS MATERIALIZED (
  SELECT ka AS u, kb AS t, w FROM wedge
  UNION ALL SELECT kb, ka, w FROM wedge),
nr AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS R FROM repos),
wdeg AS MATERIALIZED (SELECT u, SUM(w) AS d FROM sym GROUP BY u),
r0 AS MATERIALIZED (SELECT rid AS v, 1.0 / (SELECT R FROM nr) AS r
                    FROM repos),
{','.join(steps)}
SELECT rp.repo AS repo, ROUND(x.r, 6) AS pagerank
FROM r{iters} x JOIN repos rp ON rp.rid = x.v"""


def _ppr_sql(iters: int = 15, alpha: float = 0.85,
             seed_mod: int = 97) -> str:
    """Unrolled personalized PageRank matching
    pagerank.py::personalized_pagerank exactly: teleport and dangling
    mass restricted to seeds (v % seed_mod == 0, |S| = ceil(V/97));
    r0 = 1/|S| on seeds else 0. Same weighted-push recurrence and
    MATERIALIZED unroll as _pagerank_fixed_sql."""
    steps = []
    for k in range(iters):
        steps.append(f"""
r{k + 1} AS MATERIALIZED (
  SELECT vid.v AS v,
         {alpha} * (COALESCE(c.s, 0))
         + CASE WHEN vid.v % {seed_mod} = 0 THEN
             (1 - {alpha}) / (SELECT S FROM ns)
             + {alpha} * (SELECT COALESCE(SUM(p.r), 0) FROM r{k} p
                          LEFT JOIN wdeg dd ON dd.u = p.v
                          WHERE dd.u IS NULL) / (SELECT S FROM ns)
           ELSE 0 END AS r
  FROM vid
  LEFT JOIN (SELECT s.t AS v, SUM(p.r * s.w / d.d) AS s
             FROM r{k} p JOIN wdeg d ON d.u = p.v JOIN sym s ON s.u = p.v
             GROUP BY s.t) c ON c.v = vid.v)""")
    return f"""WITH {_CORPUS_CTE},
vid AS MATERIALIZED (SELECT repo || '|' || path AS key,
        ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v FROM files),
wpair AS (
  SELECT src_repo||'|'||src_path AS ks, dst_repo||'|'||dst_path AS kd,
         CAST(1 AS DOUBLE) AS w FROM import_edges
  UNION ALL
  SELECT src_repo||'|'||src_path, dst_repo||'|'||dst_path,
         CAST(weight AS DOUBLE) FROM cocommit_edges),
wedge AS (SELECT LEAST(ks, kd) AS ka, GREATEST(ks, kd) AS kb, SUM(w) AS w
          FROM wpair GROUP BY 1, 2),
sym AS MATERIALIZED (
  SELECT va.v AS u, vb.v AS t, w FROM wedge
    JOIN vid va ON va.key = ka JOIN vid vb ON vb.key = kb
  UNION ALL
  SELECT vb.v, va.v, w FROM wedge
    JOIN vid va ON va.key = ka JOIN vid vb ON vb.key = kb),
ns AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS S FROM vid
                    WHERE v % {seed_mod} = 0),
wdeg AS MATERIALIZED (SELECT u, SUM(w) AS d FROM sym GROUP BY u),
r0 AS MATERIALIZED (
  SELECT v, CASE WHEN v % {seed_mod} = 0
                 THEN 1.0 / (SELECT S FROM ns) ELSE 0 END AS r FROM vid),
{','.join(steps)}
SELECT v AS vertex, ROUND(r, 6) AS ppr FROM r{iters}"""


def _hits_sql(iters: int = 8) -> str:
    """Unrolled HITS over the directed import graph, matching
    algorithms/hits.py exactly: h0=1 on every file vertex, a_k = Aᵀh_{k-1},
    h_k = A a_k (unnormalized), final L2 normalize + ROUND 6. Each half-step
    MATERIALIZED so the chain doesn't inline exponentially."""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f"""
a{k} AS MATERIALIZED (
  SELECT vid.v AS v, COALESCE(x.s, 0) AS a
  FROM vid
  LEFT JOIN (SELECT de.t AS v, SUM(p.h) AS s
             FROM h{k - 1} p JOIN de ON de.u = p.v
             GROUP BY de.t) x ON x.v = vid.v),
h{k} AS MATERIALIZED (
  SELECT vid.v AS v, COALESCE(x.s, 0) AS h
  FROM vid
  LEFT JOIN (SELECT de.u AS v, SUM(q.a) AS s
             FROM a{k} q JOIN de ON de.t = q.v
             GROUP BY de.u) x ON x.v = vid.v)""")
    return f"""WITH {_CORPUS_CTE},
vid AS MATERIALIZED (SELECT repo || '|' || path AS key,
        ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v FROM files),
de AS MATERIALIZED (
  SELECT vs.v AS u, vd.v AS t FROM import_edges e
  JOIN vid vs ON vs.key = e.src_repo || '|' || e.src_path
  JOIN vid vd ON vd.key = e.dst_repo || '|' || e.dst_path),
h0 AS MATERIALIZED (SELECT v, CAST(1 AS DOUBLE) AS h FROM vid),
{','.join(steps)},
hn AS (SELECT SQRT(SUM(h * h)) AS n FROM h{iters}),
an AS (SELECT SQRT(SUM(a * a)) AS n FROM a{iters})
SELECT h.v AS vertex,
       ROUND(h.h / NULLIF((SELECT n FROM hn), 0), 6) AS hub,
       ROUND(a.a / NULLIF((SELECT n FROM an), 0), 6) AS authority
FROM h{iters} h JOIN a{iters} a ON a.v = h.v"""


def _ktruss_sql(k: int = 4, rounds: int = 12) -> str:
    """Unrolled k-truss peel matching trisupport.py::ktruss exactly:
    each round recomputes per-edge triangle support over the surviving
    edge set and drops edges with support < k-2. Post-fixpoint rounds
    are no-ops, so any unroll depth ≥ the engine's converged round count
    yields the final subgraph (the engine raises past max_rounds=12).
    Every step MATERIALIZED — the tri join would otherwise inline."""
    thresh = k - 2
    steps = []
    for r in range(rounds):
        steps.append(f"""
t{r} AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e{r} e1
  JOIN e{r} e2 ON e2.a = e1.b
  JOIN e{r} e3 ON e3.a = e1.a AND e3.b = e2.b),
s{r} AS MATERIALIZED (
  SELECT e{r}.a, e{r}.b, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
  FROM e{r}
  LEFT JOIN (SELECT a, b, COUNT(*) AS n FROM (
               SELECT x AS a, y AS b FROM t{r}
               UNION ALL SELECT x, z FROM t{r}
               UNION ALL SELECT y, z FROM t{r}) u
             GROUP BY a, b) c
    ON c.a = e{r}.a AND c.b = e{r}.b),
e{r + 1} AS MATERIALIZED (SELECT a, b FROM s{r} WHERE n >= {thresh})""")
    return f"""WITH {_CORPUS_CTE},
vid AS (
  SELECT repo || '|' || path AS key,
         ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v
  FROM files),
e AS (
  SELECT va.v AS u, vb.v AS w
  FROM canon c
  JOIN vid va ON va.key = c.key_a
  JOIN vid vb ON vb.key = c.key_b),
e0 AS MATERIALIZED (
  SELECT LEAST(u, w) AS a, GREATEST(u, w) AS b FROM e
  WHERE u <> w GROUP BY 1, 2),
{','.join(steps)}
SELECT a AS src, b AS dst, n AS support
FROM s{rounds - 1} WHERE n >= {thresh}"""


def _walks_sql(length: int = 8, seed_mod: int = 13) -> str:
    """Unrolled deterministic random walks matching
    algorithms/walks.py::random_walks exactly: step t moves from u to
    its r-th smallest neighbor with r = (u*1000003 + 7919*t) % deg(u);
    seeds are non-isolated vertices with v % seed_mod == 0."""
    steps = []
    sel = ["SELECT start, CAST(0 AS BIGINT) AS step, cur AS vertex "
           "FROM w0"]
    for t in range(1, length + 1):
        steps.append(f"""
w{t} AS (
  SELECT w.start, a.v AS cur
  FROM w{t - 1} w
  JOIN adjr a ON a.u = w.cur
    AND a.rnk = (w.cur * 1000003 + 7919 * {t}) % a.deg)""")
        sel.append(f"SELECT start, CAST({t} AS BIGINT) AS step, "
                   f"cur AS vertex FROM w{t}")
    return f"""WITH {_CORPUS_CTE},
vid AS (
  SELECT repo || '|' || path AS key,
         ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v
  FROM files),
e AS (
  SELECT va.v AS u, vb.v AS w
  FROM canon c
  JOIN vid va ON va.key = c.key_a
  JOIN vid vb ON vb.key = c.key_b),
eo AS (
  SELECT LEAST(u, w) AS a, GREATEST(u, w) AS b FROM e
  WHERE u <> w GROUP BY 1, 2),
adjr AS MATERIALIZED (
  SELECT u, v, ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) - 1 AS rnk,
         COUNT(*) OVER (PARTITION BY u) AS deg
  FROM (SELECT a AS u, b AS v FROM eo UNION ALL SELECT b, a FROM eo)),
w0 AS (
  SELECT DISTINCT u AS start, u AS cur FROM adjr
  WHERE u % {seed_mod} = 0),
{','.join(steps)}
{' UNION ALL '.join(sel)}"""


def _mis_sql(rounds: int = 16, seed: int = 11) -> str:
    """Unrolled fixed-priority Luby MIS matching algorithms/mis.py
    exactly: key(v) = (splitmix64(v, seed) >> 32) · V + v via the proven
    HUGEINT transcription (_splitmix_split_sql), then per round an alive
    vertex joins iff its key < every alive neighbor's key, and alive
    shrinks by the joiners and their neighbors. The engine asserts it
    converged within `rounds` (corpus_queries.graph_mis), so the trailing
    unrolled rounds are no-ops on an empty alive set."""
    a_seed = (0x9E3779B97F4A7C15 * seed) % (1 << 64)
    b = 0xBF58476D1CE4E5B9
    m64 = 1 << 64
    mulmod = (f"((x % 4294967296) * {b}"
              f" + ((((x // 4294967296) * {b}) % 4294967296)"
              f" * 4294967296)) % {m64}")
    steps = []
    for k in range(rounds):
        steps.append(f"""
j{k} AS MATERIALIZED (
  SELECT a.v FROM a{k} a JOIN kv ka ON ka.v = a.v
  WHERE NOT EXISTS (
    SELECT 1 FROM sym s
    JOIN a{k} w ON w.v = s.t
    JOIN kv kb ON kb.v = s.t
    WHERE s.u = a.v AND kb.key < ka.key)),
a{k + 1} AS MATERIALIZED (
  SELECT v FROM a{k}
  WHERE v NOT IN (SELECT v FROM j{k})
    AND v NOT IN (SELECT s.t FROM sym s JOIN j{k} j ON j.v = s.u))""")
    joins = " UNION ALL ".join(f"SELECT v FROM j{k}" for k in range(rounds))
    return f"""WITH {_CORPUS_CTE},
vid AS MATERIALIZED (SELECT repo || '|' || path AS key,
        ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v FROM files),
wpair AS (
  SELECT src_repo||'|'||src_path AS ks, dst_repo||'|'||dst_path AS kd
  FROM import_edges
  UNION ALL
  SELECT src_repo||'|'||src_path, dst_repo||'|'||dst_path
  FROM cocommit_edges),
wedge AS (SELECT DISTINCT LEAST(ks, kd) AS ka, GREATEST(ks, kd) AS kb
          FROM wpair),
sym AS MATERIALIZED (
  SELECT va.v AS u, vb.v AS t FROM wedge
    JOIN vid va ON va.key = ka JOIN vid vb ON vb.key = kb
  WHERE va.v <> vb.v
  UNION ALL
  SELECT vb.v, va.v FROM wedge
    JOIN vid va ON va.key = ka JOIN vid vb ON vb.key = kb
  WHERE va.v <> vb.v),
s0 AS (SELECT v, (CAST(v AS HUGEINT) + {a_seed}) % {m64} AS x FROM vid),
s1 AS (SELECT v, CAST(xor(CAST(x AS UBIGINT),
       CAST(x AS UBIGINT) >> 30) AS HUGEINT) AS x FROM s0),
s2 AS (SELECT v, {mulmod} AS x FROM s1),
s3 AS (SELECT v, xor(CAST(x AS UBIGINT),
       CAST(x AS UBIGINT) >> 27) AS x FROM s2),
kv AS MATERIALIZED (
  SELECT v, CAST(x >> 32 AS BIGINT)
            * (SELECT COUNT(*) FROM vid) + v AS key
  FROM s3),
a0 AS MATERIALIZED (SELECT v FROM vid),
{','.join(steps)},
mis AS ({joins})
SELECT vid.v AS vertex,
       CAST(CASE WHEN mis.v IS NULL THEN 0 ELSE 1 END AS BIGINT) AS in_mis
FROM vid LEFT JOIN mis ON mis.v = vid.v"""


def _coloring_sql(rounds: int = 40, seed: int = 11) -> str:
    """Unrolled Jones–Plassmann wave-coloring recurrence matching
    algorithms/coloring.py exactly: the mis_key HUGEINT hash chain,
    then c_0(v) = 1 and c_{k+1}(v) = 1 + MAX(c_k(u) : u adjacent,
    key(u) < key(v)) (MAX of nothing → 0). c_k = min(depth, k) + 1, so
    the engine's assertion (max color ≤ rounds + 1) makes trailing
    rounds provable no-ops."""
    a_seed = (0x9E3779B97F4A7C15 * seed) % (1 << 64)
    b = 0xBF58476D1CE4E5B9
    m64 = 1 << 64
    mulmod = (f"((x % 4294967296) * {b}"
              f" + ((((x // 4294967296) * {b}) % 4294967296)"
              f" * 4294967296)) % {m64}")
    steps = []
    for k in range(rounds):
        steps.append(f"""
c{k + 1} AS MATERIALIZED (
  SELECT a.v,
         1 + COALESCE(MAX(CASE WHEN ku.key < ka.key THEN c.col END), 0)
           AS col
  FROM vid a
  JOIN kv ka ON ka.v = a.v
  LEFT JOIN sym s ON s.u = a.v
  LEFT JOIN kv ku ON ku.v = s.t
  LEFT JOIN c{k} c ON c.v = s.t
  GROUP BY a.v, ka.key)""")
    return f"""WITH {_CORPUS_CTE},
vid AS MATERIALIZED (SELECT repo || '|' || path AS key,
        ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v FROM files),
wpair AS (
  SELECT src_repo||'|'||src_path AS ks, dst_repo||'|'||dst_path AS kd
  FROM import_edges
  UNION ALL
  SELECT src_repo||'|'||src_path, dst_repo||'|'||dst_path
  FROM cocommit_edges),
wedge AS (SELECT DISTINCT LEAST(ks, kd) AS ka, GREATEST(ks, kd) AS kb
          FROM wpair),
sym AS MATERIALIZED (
  SELECT va.v AS u, vb.v AS t FROM wedge
    JOIN vid va ON va.key = ka JOIN vid vb ON vb.key = kb
  WHERE va.v <> vb.v
  UNION ALL
  SELECT vb.v, va.v FROM wedge
    JOIN vid va ON va.key = ka JOIN vid vb ON vb.key = kb
  WHERE va.v <> vb.v),
s0 AS (SELECT v, (CAST(v AS HUGEINT) + {a_seed}) % {m64} AS x FROM vid),
s1 AS (SELECT v, CAST(xor(CAST(x AS UBIGINT),
       CAST(x AS UBIGINT) >> 30) AS HUGEINT) AS x FROM s0),
s2 AS (SELECT v, {mulmod} AS x FROM s1),
s3 AS (SELECT v, xor(CAST(x AS UBIGINT),
       CAST(x AS UBIGINT) >> 27) AS x FROM s2),
kv AS MATERIALIZED (
  SELECT v, CAST(x >> 32 AS BIGINT)
            * (SELECT COUNT(*) FROM vid) + v AS key
  FROM s3),
c0 AS MATERIALIZED (SELECT v, CAST(1 AS BIGINT) AS col FROM vid),
{','.join(steps)}
SELECT v AS vertex, CAST(col AS BIGINT) AS color FROM c{rounds}"""


def _spcount_sql(levels: int = 16) -> str:
    """Level-unrolled BFS path counting matching algorithms/spcount.py:
    lv{d} = the (seed, vertex, σ) rows settled at distance d — σ of a
    new vertex is the SUM of its level-(d-1) neighbors' σ, computed over
    every predecessor at once (synchronous levels), and already-settled
    vertices are excluded via the seen-set anti-join. The engine asserts
    its true BFS depth ≤ `levels`, so trailing levels are empty no-ops.
    DuckDB sums BIGINT into HUGEINT (exact); the engine guards σ < 2^53."""
    steps = []
    for d in range(1, levels + 1):
        steps.append(f"""
lv{d} AS MATERIALIZED (
  SELECT p.seed, s.u AS v, SUM(p.sigma) AS sigma
  FROM lv{d - 1} p JOIN sym s ON s.w = p.v
  WHERE NOT EXISTS (SELECT 1 FROM seen{d - 1} x
                    WHERE x.seed = p.seed AND x.v = s.u)
  GROUP BY p.seed, s.u),
seen{d} AS MATERIALIZED (
  SELECT seed, v FROM seen{d - 1}
  UNION ALL SELECT seed, v FROM lv{d})""")
    dists = " UNION ALL ".join(
        f"SELECT seed, v, {d} AS dist, sigma FROM lv{d}"
        for d in range(levels + 1))
    return f"""WITH {_CORPUS_CTE},
vid AS MATERIALIZED (SELECT repo || '|' || path AS key,
        ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v FROM files),
wpair AS (
  SELECT src_repo||'|'||src_path AS ks, dst_repo||'|'||dst_path AS kd
  FROM import_edges
  UNION ALL
  SELECT src_repo||'|'||src_path, dst_repo||'|'||dst_path
  FROM cocommit_edges),
wedge AS (SELECT DISTINCT LEAST(ks, kd) AS ka, GREATEST(ks, kd) AS kb
          FROM wpair),
sym AS MATERIALIZED (
  SELECT va.v AS u, vb.v AS w FROM wedge
    JOIN vid va ON va.key = ka JOIN vid vb ON vb.key = kb
  WHERE va.v <> vb.v
  UNION ALL
  SELECT vb.v, va.v FROM wedge
    JOIN vid va ON va.key = ka JOIN vid vb ON vb.key = kb
  WHERE va.v <> vb.v),
seeds AS (SELECT v FROM vid
          WHERE v % 97 = 0 AND v < 97 * 4),
lv0 AS MATERIALIZED (SELECT v AS seed, v, CAST(1 AS BIGINT) AS sigma
                     FROM seeds),
seen0 AS MATERIALIZED (SELECT seed, v FROM lv0),
{','.join(steps)},
alllv AS ({dists})
SELECT sd.v AS seed, vid.v AS vertex,
       CAST(COALESCE(a.dist, -1) AS BIGINT) AS dist,
       CAST(COALESCE(a.sigma, 0) AS BIGINT) AS sigma
FROM seeds sd CROSS JOIN vid
LEFT JOIN alllv a ON a.seed = sd.v AND a.v = vid.v"""


def _betweenness_sql(levels: int = 16) -> str:
    """_spcount_sql's forward levels plus the backward quantized
    dependency recurrence of spcount.py::betweenness_quantized:
      dl{d}.dq = σ(v) · Σ over level-(d+1) successors of
                 (SCALE + dq_succ) // σ_succ
    — all BIGINT floor-div/multiply/sum, so both sides are bit-exact.
    dq at the seed itself is emitted as 0 (Brandes convention)."""
    scale = 1 << 20
    steps = []
    for d in range(1, levels + 1):
        steps.append(f"""
lv{d} AS MATERIALIZED (
  SELECT p.seed, s.u AS v, SUM(p.sigma) AS sigma
  FROM lv{d - 1} p JOIN sym s ON s.w = p.v
  WHERE NOT EXISTS (SELECT 1 FROM seen{d - 1} x
                    WHERE x.seed = p.seed AND x.v = s.u)
  GROUP BY p.seed, s.u),
seen{d} AS MATERIALIZED (
  SELECT seed, v FROM seen{d - 1}
  UNION ALL SELECT seed, v FROM lv{d})""")
    back = [f"""
dl{levels} AS MATERIALIZED (
  SELECT seed, v, CAST(0 AS BIGINT) AS dq FROM lv{levels})"""]
    for d in range(levels - 1, -1, -1):
        back.append(f"""
dl{d} AS MATERIALIZED (
  SELECT p.seed, p.v,
         CAST(p.sigma * COALESCE(agg.q, 0) AS BIGINT) AS dq
  FROM lv{d} p
  LEFT JOIN (
    SELECT wv.seed, s.u AS v,
           SUM(({scale} + w.dq) // wv.sigma) AS q
    FROM sym s
    JOIN lv{d + 1} wv ON wv.v = s.w
    JOIN dl{d + 1} w ON w.seed = wv.seed AND w.v = wv.v
    GROUP BY wv.seed, s.u) agg
    ON agg.seed = p.seed AND agg.v = p.v)""")
    dists = " UNION ALL ".join(
        f"SELECT l.seed, l.v, {d} AS dist, l.sigma, dl{d}.dq "
        f"FROM lv{d} l JOIN dl{d} ON dl{d}.seed = l.seed "
        f"AND dl{d}.v = l.v"
        for d in range(levels + 1))
    return f"""WITH {_CORPUS_CTE},
vid AS MATERIALIZED (SELECT repo || '|' || path AS key,
        ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v FROM files),
wpair AS (
  SELECT src_repo||'|'||src_path AS ks, dst_repo||'|'||dst_path AS kd
  FROM import_edges
  UNION ALL
  SELECT src_repo||'|'||src_path, dst_repo||'|'||dst_path
  FROM cocommit_edges),
wedge AS (SELECT DISTINCT LEAST(ks, kd) AS ka, GREATEST(ks, kd) AS kb
          FROM wpair),
sym AS MATERIALIZED (
  SELECT va.v AS u, vb.v AS w FROM wedge
    JOIN vid va ON va.key = ka JOIN vid vb ON vb.key = kb
  WHERE va.v <> vb.v
  UNION ALL
  SELECT vb.v, va.v FROM wedge
    JOIN vid va ON va.key = ka JOIN vid vb ON vb.key = kb
  WHERE va.v <> vb.v),
seeds AS (SELECT v FROM vid
          WHERE v % 97 = 0 AND v < 97 * 4),
lv0 AS MATERIALIZED (SELECT v AS seed, v, CAST(1 AS BIGINT) AS sigma
                     FROM seeds),
seen0 AS MATERIALIZED (SELECT seed, v FROM lv0),
{','.join(steps)},
{','.join(back)},
alllv AS ({dists})
SELECT sd.v AS seed, vid.v AS vertex,
       CAST(COALESCE(a.dist, -1) AS BIGINT) AS dist,
       CAST(COALESCE(a.sigma, 0) AS BIGINT) AS sigma,
       CAST(CASE WHEN sd.v = vid.v THEN 0
                 ELSE COALESCE(a.dq, 0) END AS BIGINT) AS delta_q
FROM seeds sd CROSS JOIN vid
LEFT JOIN alllv a ON a.seed = sd.v AND a.v = vid.v"""


def _matching_sql(rounds: int = 24, seed: int = 13) -> str:
    """Unrolled deterministic handshake matching matching
    algorithms/matching.py exactly: per round each alive vertex proposes
    to its min-key alive neighbor (key = the HUGEINT-transcribed
    mis_key), mutual proposals match, matched endpoints leave. The
    engine asserts convergence within `rounds`
    (corpus_queries.graph_matching), so trailing rounds are no-ops."""
    a_seed = (0x9E3779B97F4A7C15 * seed) % (1 << 64)
    b = 0xBF58476D1CE4E5B9
    m64 = 1 << 64
    mulmod = (f"((x % 4294967296) * {b}"
              f" + ((((x // 4294967296) * {b}) % 4294967296)"
              f" * 4294967296)) % {m64}")
    steps = []
    for k in range(rounds):
        steps.append(f"""
p{k} AS MATERIALIZED (
  SELECT u, t FROM (
    SELECT s.u, s.t,
           ROW_NUMBER() OVER (PARTITION BY s.u
               ORDER BY kb.key ASC) AS rn
    FROM sym s
    JOIN a{k} au ON au.v = s.u
    JOIN a{k} av ON av.v = s.t
    JOIN kv kb ON kb.v = s.t) x
  WHERE rn = 1),
m{k} AS MATERIALIZED (
  SELECT p1.u AS a, p1.t AS b
  FROM p{k} p1 JOIN p{k} p2 ON p2.u = p1.t AND p2.t = p1.u
  WHERE p1.u < p1.t),
a{k + 1} AS MATERIALIZED (
  SELECT v FROM a{k}
  WHERE v NOT IN (SELECT a FROM m{k})
    AND v NOT IN (SELECT b FROM m{k}))""")
    mm = " UNION ALL ".join(
        f"SELECT a, b FROM m{k} UNION ALL SELECT b, a FROM m{k}"
        for k in range(rounds))
    return f"""WITH {_CORPUS_CTE},
vid AS MATERIALIZED (SELECT repo || '|' || path AS key,
        ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v FROM files),
wpair AS (
  SELECT src_repo||'|'||src_path AS ks, dst_repo||'|'||dst_path AS kd
  FROM import_edges
  UNION ALL
  SELECT src_repo||'|'||src_path, dst_repo||'|'||dst_path
  FROM cocommit_edges),
wedge AS (SELECT DISTINCT LEAST(ks, kd) AS ka, GREATEST(ks, kd) AS kb
          FROM wpair),
sym AS MATERIALIZED (
  SELECT va.v AS u, vb.v AS t FROM wedge
    JOIN vid va ON va.key = ka JOIN vid vb ON vb.key = kb
  WHERE va.v <> vb.v
  UNION ALL
  SELECT vb.v, va.v FROM wedge
    JOIN vid va ON va.key = ka JOIN vid vb ON vb.key = kb
  WHERE va.v <> vb.v),
s0 AS (SELECT v, (CAST(v AS HUGEINT) + {a_seed}) % {m64} AS x FROM vid),
s1 AS (SELECT v, CAST(xor(CAST(x AS UBIGINT),
       CAST(x AS UBIGINT) >> 30) AS HUGEINT) AS x FROM s0),
s2 AS (SELECT v, {mulmod} AS x FROM s1),
s3 AS (SELECT v, xor(CAST(x AS UBIGINT),
       CAST(x AS UBIGINT) >> 27) AS x FROM s2),
kv AS MATERIALIZED (
  SELECT v, CAST(x >> 32 AS BIGINT)
            * (SELECT COUNT(*) FROM vid) + v AS key
  FROM s3),
a0 AS MATERIALIZED (SELECT v FROM vid),
{','.join(steps)},
mm AS ({mm})
SELECT vid.v AS vertex,
       CAST(COALESCE(mm.b, -1) AS BIGINT) AS mate
FROM vid LEFT JOIN mm ON mm.a = vid.v"""


def _labelprop_sql(iters: int = 25) -> str:
    """Unrolled synchronous label propagation matching the engine exactly
    (labelprop.py): label_v ← argmax_c Σ w over neighbors, tie → max
    weight then MIN label, isolated vertices keep their own id. The engine
    converges (changed == 0, a fixpoint of the sync update) well before
    `iters`, and post-fixpoint rounds are no-ops, so any iters ≥ the
    convergence round yields its labels. Weights are integer-valued counts,
    so float sums are exact and tie-breaks agree bit-for-bit."""
    steps = []
    for k in range(iters):
        steps.append(f"""
r{k + 1} AS MATERIALIZED (
  SELECT vid.v AS v, COALESCE(wn.lbl, p.l) AS l
  FROM vid JOIN r{k} p ON p.v = vid.v
  LEFT JOIN (
    SELECT v, lbl FROM (
      SELECT s.t AS v, p2.l AS lbl,
             ROW_NUMBER() OVER (PARTITION BY s.t
                 ORDER BY SUM(s.w) DESC, p2.l ASC) AS rn
      FROM r{k} p2 JOIN sym s ON s.u = p2.v
      GROUP BY s.t, p2.l) x WHERE rn = 1) wn ON wn.v = vid.v)""")
    return f"""WITH {_CORPUS_CTE},
vid AS MATERIALIZED (SELECT repo || '|' || path AS key,
        ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v FROM files),
wpair AS (
  SELECT src_repo||'|'||src_path AS ks, dst_repo||'|'||dst_path AS kd,
         CAST(1 AS DOUBLE) AS w FROM import_edges
  UNION ALL
  SELECT src_repo||'|'||src_path, dst_repo||'|'||dst_path,
         CAST(weight AS DOUBLE) FROM cocommit_edges),
wedge AS (SELECT LEAST(ks, kd) AS ka, GREATEST(ks, kd) AS kb, SUM(w) AS w
          FROM wpair GROUP BY 1, 2),
sym AS MATERIALIZED (
  SELECT va.v AS u, vb.v AS t, w FROM wedge
    JOIN vid va ON va.key = ka JOIN vid vb ON vb.key = kb
  UNION ALL
  SELECT vb.v, va.v, w FROM wedge
    JOIN vid va ON va.key = ka JOIN vid vb ON vb.key = kb),
r0 AS MATERIALIZED (SELECT v, v AS l FROM vid),
{','.join(steps)}
SELECT v AS vertex, l AS label FROM r{iters}"""


def _sssp_sql(iters: int = 40, seed_mod: int = 97) -> str:
    """Unrolled synchronous weighted Bellman–Ford matching the engine
    exactly (algorithms/sssp.py): d_{{k+1}}(v) = min(d_k(v),
    min_{{(u,v,w)}} d_k(u) + w) over the symmetrized union graph with
    its integer weights. The engine converges (changed == 0) well
    before `iters` and asserts so; post-fixpoint rounds are no-ops.
    Unreachable = the 2^62 sentinel, reported as -1 on both sides."""
    inf = 1 << 62
    steps = []
    for k in range(iters):
        steps.append(f"""
r{k + 1} AS MATERIALIZED (
  SELECT p.v AS v, LEAST(p.d, COALESCE(m.nd, p.d)) AS d
  FROM r{k} p
  LEFT JOIN (
    SELECT s.t AS v, MIN(p2.d + s.wi) AS nd
    FROM r{k} p2 JOIN sym s ON s.u = p2.v
    GROUP BY s.t) m ON m.v = p.v)""")
    return f"""WITH {_CORPUS_CTE},
vid AS MATERIALIZED (SELECT repo || '|' || path AS key,
        ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v FROM files),
wpair AS (
  SELECT src_repo||'|'||src_path AS ks, dst_repo||'|'||dst_path AS kd,
         CAST(1 AS DOUBLE) AS w FROM import_edges
  UNION ALL
  SELECT src_repo||'|'||src_path, dst_repo||'|'||dst_path,
         CAST(weight AS DOUBLE) FROM cocommit_edges),
wedge AS (SELECT LEAST(ks, kd) AS ka, GREATEST(ks, kd) AS kb, SUM(w) AS w
          FROM wpair GROUP BY 1, 2),
sym AS MATERIALIZED (
  SELECT va.v AS u, vb.v AS t, CAST(w AS BIGINT) AS wi FROM wedge
    JOIN vid va ON va.key = ka JOIN vid vb ON vb.key = kb
  UNION ALL
  SELECT vb.v, va.v, CAST(w AS BIGINT) FROM wedge
    JOIN vid va ON va.key = ka JOIN vid vb ON vb.key = kb),
r0 AS MATERIALIZED (SELECT v, CASE WHEN v % {seed_mod} = 0 THEN 0
        ELSE {inf} END AS d FROM vid),
{','.join(steps)}
SELECT v AS vertex, CASE WHEN d >= {inf} THEN CAST(-1 AS BIGINT)
       ELSE CAST(d AS BIGINT) END AS dist FROM r{iters}"""


def _splitmix_split_sql(train_pct: int = 80, seed: int = 42) -> str:
    """Exact SQL transcription of functions/sampling.py::hash_split —
    the splitmix64 finalizer in 128-bit HUGEINT arithmetic, with the
    64-bit multiply split into 32-bit halves so the intermediate products
    stay under 2^96 (a full 64x64 product can overflow HUGEINT)."""
    a_seed = (0x9E3779B97F4A7C15 * seed) % (1 << 64)
    b = 0xBF58476D1CE4E5B9
    m64 = 1 << 64
    mulmod = (f"((x % 4294967296) * {b}"
              f" + ((((x // 4294967296) * {b}) % 4294967296)"
              f" * 4294967296)) % {m64}")
    return f"""
        WITH s0 AS (SELECT doc_id, lang,
               (CAST(doc_id AS HUGEINT) + {a_seed}) % {m64} AS x
             FROM documents),
        s1 AS (SELECT doc_id, lang, CAST(xor(CAST(x AS UBIGINT),
               CAST(x AS UBIGINT) >> 30) AS HUGEINT) AS x FROM s0),
        s2 AS (SELECT doc_id, lang, {mulmod} AS x FROM s1),
        s3 AS (SELECT doc_id, lang, xor(CAST(x AS UBIGINT),
               CAST(x AS UBIGINT) >> 27) AS x FROM s2)
        SELECT doc_id, lang,
               CASE WHEN x % 100 < {train_pct} THEN 'train' ELSE 'val' END
                 AS split
        FROM s3"""


def _stratified_sample_sql(n: int = 25, seed: int = 7) -> str:
    """Exact SQL transcription of sampling.py::stratified_sample — the
    same HUGEINT splitmix64 chain as _splitmix_split_sql, then a per-lang
    rank over (hash ASC, doc_id ASC) capped at n."""
    a_seed = (0x9E3779B97F4A7C15 * seed) % (1 << 64)
    b = 0xBF58476D1CE4E5B9
    m64 = 1 << 64
    mulmod = (f"((x % 4294967296) * {b}"
              f" + ((((x // 4294967296) * {b}) % 4294967296)"
              f" * 4294967296)) % {m64}")
    return f"""
        WITH s0 AS (SELECT doc_id, lang,
               (CAST(doc_id AS HUGEINT) + {a_seed}) % {m64} AS x
             FROM documents),
        s1 AS (SELECT doc_id, lang, CAST(xor(CAST(x AS UBIGINT),
               CAST(x AS UBIGINT) >> 30) AS HUGEINT) AS x FROM s0),
        s2 AS (SELECT doc_id, lang, {mulmod} AS x FROM s1),
        s3 AS (SELECT doc_id, lang, xor(CAST(x AS UBIGINT),
               CAST(x AS UBIGINT) >> 27) AS x FROM s2),
        rk AS (SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY x ASC, doc_id ASC) AS rn
             FROM s3)
        SELECT doc_id, lang, CAST(rn AS BIGINT) AS rnk
        FROM rk WHERE rn <= {n}"""


def _weighted_sample_sql(n: int = 100, seed: int = 19) -> str:
    """Exact SQL transcription of sampling.py::weighted_sample —
    sequential Poisson sampling: the HUGEINT splitmix64 chain over
    doc_id, priority = hash // max(n_chars, 1) (exact integer floor
    division on both sides), global top-n by (priority, doc_id)."""
    a_seed = (0x9E3779B97F4A7C15 * seed) % (1 << 64)
    b = 0xBF58476D1CE4E5B9
    m64 = 1 << 64
    mulmod = (f"((x % 4294967296) * {b}"
              f" + ((((x // 4294967296) * {b}) % 4294967296)"
              f" * 4294967296)) % {m64}")
    return f"""
        WITH s0 AS (SELECT doc_id, n_chars,
               (CAST(doc_id AS HUGEINT) + {a_seed}) % {m64} AS x
             FROM documents),
        s1 AS (SELECT doc_id, n_chars, CAST(xor(CAST(x AS UBIGINT),
               CAST(x AS UBIGINT) >> 30) AS HUGEINT) AS x FROM s0),
        s2 AS (SELECT doc_id, n_chars, {mulmod} AS x FROM s1),
        s3 AS (SELECT doc_id, n_chars,
               CAST(xor(CAST(x AS UBIGINT), CAST(x AS UBIGINT) >> 27)
                    AS HUGEINT) AS x FROM s2),
        pr AS (SELECT doc_id, n_chars,
               x // GREATEST(CAST(n_chars AS HUGEINT), 1) AS q FROM s3),
        rk AS (SELECT doc_id, n_chars,
               ROW_NUMBER() OVER (ORDER BY q ASC, doc_id ASC) AS rn
             FROM pr)
        SELECT doc_id, n_chars, CAST(rn AS BIGINT) AS rnk
        FROM rk WHERE rn <= {n}"""


def _kcore_sql(iters: int = 32) -> str:
    """Unrolled h-index iteration matching the engine exactly (kcore.py):
    c_0 = unweighted degree (self-loops excluded), c_{n+1}(v) = h-index of
    the neighbors' c_n values; the fixpoint is the core number (Lu et al.
    2016). H in SQL: sort a vertex's neighbor values descending and take
    MAX(LEAST(value, row_number)). The engine asserts it converged
    (changed == 0), the sequence is pointwise non-increasing, and
    post-fixpoint rounds are no-ops, so any iters >= the convergence round
    yields the same table. All values are BIGINTs — exact."""
    steps = []
    for k in range(iters):
        steps.append(f"""
r{k + 1} AS MATERIALIZED (
  SELECT vid.v AS v, COALESCE(h.hc, 0) AS c
  FROM vid LEFT JOIN (
    SELECT t AS v, MAX(LEAST(nc, rn)) AS hc FROM (
      SELECT s.t, p.c AS nc,
             ROW_NUMBER() OVER (PARTITION BY s.t
                                ORDER BY p.c DESC) AS rn
      FROM r{k} p JOIN sym s ON s.u = p.v) x
    GROUP BY t) h ON h.v = vid.v)""")
    return f"""WITH {_CORPUS_CTE},
vid AS MATERIALIZED (SELECT repo || '|' || path AS key,
        ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v FROM files),
pair AS (
  SELECT src_repo||'|'||src_path AS ks, dst_repo||'|'||dst_path AS kd
  FROM import_edges
  UNION ALL
  SELECT src_repo||'|'||src_path, dst_repo||'|'||dst_path
  FROM cocommit_edges),
uedge AS (SELECT DISTINCT LEAST(ks, kd) AS ka, GREATEST(ks, kd) AS kb
          FROM pair WHERE ks <> kd),
sym AS MATERIALIZED (
  SELECT va.v AS u, vb.v AS t FROM uedge
    JOIN vid va ON va.key = ka JOIN vid vb ON vb.key = kb
  UNION ALL
  SELECT vb.v, va.v FROM uedge
    JOIN vid va ON va.key = ka JOIN vid vb ON vb.key = kb),
r0 AS MATERIALIZED (
  SELECT vid.v AS v, COALESCE(d.n, 0) AS c FROM vid
  LEFT JOIN (SELECT u, COUNT(*) AS n FROM sym GROUP BY u) d
    ON d.u = vid.v),
{','.join(steps)}
SELECT v AS vertex, c AS core FROM r{iters}"""


def _objective_scaffold_sql(part_glob: str) -> str:
    """Shared CTEs for the objective-recompute oracles: the canonical
    weighted int edge table (same construction the pagerank oracle pins)
    plus the engine's WRITTEN partition parquet. Everything integer:
    weights are co-occurrence counts, so CAST(... AS BIGINT) is exact."""
    return f"""WITH {_CORPUS_CTE},
vid AS MATERIALIZED (SELECT repo || '|' || path AS key,
        ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v FROM files),
wpair AS (
  SELECT src_repo||'|'||src_path AS ks, dst_repo||'|'||dst_path AS kd,
         CAST(1 AS BIGINT) AS w FROM import_edges
  UNION ALL
  SELECT src_repo||'|'||src_path, dst_repo||'|'||dst_path,
         CAST(weight AS BIGINT) FROM cocommit_edges),
wedge AS MATERIALIZED (
  SELECT LEAST(ks, kd) AS ka, GREATEST(ks, kd) AS kb,
         CAST(SUM(w) AS BIGINT) AS w FROM wpair GROUP BY 1, 2),
iedge AS MATERIALIZED (
  SELECT va.v AS u, vb.v AS t, w FROM wedge
    JOIN vid va ON va.key = ka JOIN vid vb ON vb.key = kb),
part AS MATERIALIZED (
  SELECT vertex, community FROM read_parquet('{part_glob}')),
win AS (SELECT COALESCE(SUM(e.w), 0) AS w_in FROM iedge e
        JOIN part pa ON pa.vertex = e.u
        JOIN part pb ON pb.vertex = e.t
        WHERE pa.community = pb.community)"""


def _leiden_objective_sql() -> str:
    """Recompute 20·CPM(γ=0.05) from the engine's written leiden partition:
    20·CPM = 20·W_in − Σ_c n_c(n_c−1)/2, all BIGINT (graph_leiden_objective
    returns the identical integer, so the hash compare IS the invariant
    'reported objective matches the output partition')."""
    return f"""{_objective_scaffold_sql(
        '/tmp/graft_oracle/sf0.01/leiden_comm/*.parquet')}
SELECT CAST(20 * (SELECT w_in FROM win)
            - (SELECT SUM(n * (n - 1)) FROM
               (SELECT CAST(COUNT(*) AS BIGINT) AS n
                FROM part GROUP BY community)) // 2 AS BIGINT) AS cpm20,
       (SELECT CAST(COUNT(DISTINCT community) AS BIGINT) FROM part)
         AS num_communities"""


def _leiden_conductance_sql(k: int = 20) -> str:
    """Recompute per-community volume/cut from the engine's written
    leiden partition (graph_leiden_conductance): vol(c) = Σ weighted
    degree over members, cut(c) = Σ w over cross-community directed
    slots — all BIGINT-exact (integer co-occurrence weights, no
    self-loops in the derived graph)."""
    return f"""{_objective_scaffold_sql(
        '/tmp/graft_oracle/sf0.01/leiden_comm_cond/*.parquet')},
symw AS (SELECT u, t, w FROM iedge UNION ALL SELECT t, u, w FROM iedge),
nv AS (SELECT community AS c, CAST(COUNT(*) AS BIGINT) AS n
       FROM part GROUP BY 1),
vol AS (SELECT p.community AS c, CAST(SUM(s.w) AS BIGINT) AS v
        FROM symw s JOIN part p ON p.vertex = s.u GROUP BY 1),
cut AS (SELECT pu.community AS c, CAST(SUM(s.w) AS BIGINT) AS x
        FROM symw s
        JOIN part pu ON pu.vertex = s.u
        JOIN part pv ON pv.vertex = s.t
        WHERE pu.community <> pv.community GROUP BY 1)
SELECT nv.c AS community, nv.n AS n_vertices,
       COALESCE(vol.v, 0) AS vol, COALESCE(cut.x, 0) AS cut
FROM nv
LEFT JOIN vol ON vol.c = nv.c
LEFT JOIN cut ON cut.c = nv.c
ORDER BY COALESCE(vol.v, 0) DESC, nv.c ASC LIMIT {k}"""


def _louvain_objective_sql() -> str:
    """Recompute the exact-integer modularity numerator from the engine's
    written louvain partition: Q = qnum/(2m)² with
    qnum = 2m·Σ_c sum_in_c − Σ_c (Σ_{v∈c} deg_v)²,
    sum_in double-counting internal edges (the engine's convention,
    objectives.py; the derived graph has no self-loops)."""
    return f"""{_objective_scaffold_sql(
        '/tmp/graft_oracle/sf0.01/louvain_comm/*.parquet')},
deg AS (SELECT u, SUM(w) AS d FROM
          (SELECT u, w FROM iedge UNION ALL SELECT t, w FROM iedge)
        GROUP BY u),
tot AS (SELECT pa.community, CAST(SUM(d.d) AS BIGINT) AS t
        FROM part pa JOIN deg d ON d.u = pa.vertex GROUP BY 1),
twom AS (SELECT CAST(2 * SUM(w) AS BIGINT) AS m2 FROM wedge)
SELECT CAST((SELECT m2 FROM twom) * (2 * (SELECT w_in FROM win))
            - (SELECT SUM(t * t) FROM tot) AS BIGINT) AS qnum,
       (SELECT m2 FROM twom) AS two_m,
       (SELECT CAST(COUNT(DISTINCT community) AS BIGINT) FROM part)
         AS num_communities"""


def oracle_sql() -> dict[str, str]:
    # the corpus parquet must exist before DuckDB reads it
    from leiden_cuda_ray.sources.corpus import ensure_corpus_for_sf_dir

    ensure_corpus_for_sf_dir("/root/testdata/sf0.01")

    return {
        "pricing_summary": """
            -- exact integer-cents aggregation, mirroring the engine: sums
            -- are int64 (sub-2^53, exactly representable), one final divide
            SELECT l_returnflag, l_linestatus,
                   SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0
                     AS sum_qty,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0
                     AS sum_base_price,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * CAST(ROUND((1 - l_discount) * 100) AS BIGINT))
                     / 10000.0 AS sum_disc_price,
                   COUNT(*) AS "count_order"
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2000-01-01'
            GROUP BY l_returnflag, l_linestatus""",
        "top_customers": """
            SELECT c.c_custkey, c.c_name,
                   ROUND(SUM(o.o_totalprice), 6) AS total_spent
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey, c.c_name
            ORDER BY SUM(o.o_totalprice) DESC, c.c_custkey ASC
            LIMIT 10""",
        "nation_order_counts": """
            SELECT n.n_name, COUNT(*) AS order_count
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name""",
        "daily_running_revenue": """
            -- per-day revenue + global ordered running total, exact
            -- cents; day as ISO string on both sides
            WITH d AS (
              SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                     CAST(COUNT(*) AS BIGINT) AS n_orders,
                     CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS revenue_c
              FROM orders GROUP BY 1)
            SELECT day, n_orders, revenue_c,
                   CAST(SUM(revenue_c) OVER (ORDER BY day ASC)
                        AS BIGINT) AS running_revenue_c
            FROM d""",
        "bloom_semijoin": """
            -- plain join semantics: the engine's Bloom pre-filter is a
            -- wire-volume optimization whose false positives the
            -- verifying join removes, so the result is exactly this
            SELECT c.c_custkey,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS revenue_c
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            WHERE c.c_acctbal > 9000
            GROUP BY c.c_custkey""",
        "pareto_parts": """
            -- 2-d skyline: minimize retail price (cents), maximize size;
            -- a part survives iff nothing dominates it
            WITH p AS (SELECT p_partkey,
                              CAST(ROUND(p_retailprice * 100) AS BIGINT)
                                AS price_c,
                              CAST(p_size AS BIGINT) AS p_size
                       FROM part)
            SELECT b.p_partkey, b.price_c, b.p_size FROM p b
            WHERE NOT EXISTS (
              SELECT 1 FROM p a
              WHERE a.price_c <= b.price_c AND a.p_size >= b.p_size
                AND (a.price_c < b.price_c OR a.p_size > b.p_size))""",
        "priority_value_variance": """
            -- exact integer sample variance of order totals (cents²)
            -- per priority: var = (n·Σc² − (Σc)²) // (n·(n−1)), HUGEINT
            WITH t AS (SELECT o_orderpriority,
                              CAST(ROUND(o_totalprice * 100) AS BIGINT)
                                AS c
                       FROM orders),
            a AS (SELECT o_orderpriority,
                         CAST(COUNT(*) AS BIGINT) AS n_orders,
                         CAST(SUM(c) AS BIGINT) AS sum_c,
                         SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT))
                           AS ssq
                  FROM t GROUP BY 1)
            SELECT o_orderpriority, n_orders, sum_c,
                   CAST(CASE WHEN n_orders > 1 THEN
                          (n_orders * ssq
                           - CAST(sum_c AS HUGEINT) * sum_c)
                          // (CAST(n_orders AS HUGEINT) * (n_orders - 1))
                        ELSE 0 END AS BIGINT) AS var_c2
            FROM a""",
        "lineitem_corr": """
            -- grouped Pearson corr / population covar / OLS slope of
            -- (quantity units, price cents) from HUGEINT-exact
            -- sufficient statistics; each DOUBLE is the one IEEE
            -- expression the engine computes over the identical exact
            -- integers (zero-variance groups pinned to 0.0)
            WITH b AS (
              SELECT l_returnflag, l_linestatus,
                     CAST(ROUND(l_quantity) AS BIGINT) AS q,
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p
              FROM lineitem),
            s AS (
              SELECT l_returnflag, l_linestatus,
                     CAST(COUNT(*) AS HUGEINT) AS n,
                     CAST(SUM(q) AS HUGEINT) AS sx,
                     CAST(SUM(p) AS HUGEINT) AS sy,
                     CAST(SUM(q * q) AS HUGEINT) AS sxx,
                     SUM(CAST(q AS HUGEINT) * p) AS sxy,
                     SUM(CAST(p AS HUGEINT) * p) AS syy
              FROM b GROUP BY 1, 2)
            SELECT l_returnflag, l_linestatus,
                   CAST(n AS BIGINT) AS n,
                   CAST(sx AS BIGINT) AS sum_q,
                   CAST(sy AS BIGINT) AS sum_price_c,
                   CASE WHEN n * sxx - sx * sx > 0
                             AND n * syy - sy * sy > 0
                        THEN CAST(n * sxy - sx * sy AS DOUBLE)
                             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                                * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                        ELSE 0.0 END AS corr_qp,
                   CASE WHEN n > 0
                        THEN CAST(n * sxy - sx * sy AS DOUBLE)
                             / CAST(n * n AS DOUBLE)
                        ELSE 0.0 END AS covar_qp,
                   CASE WHEN n * sxx - sx * sx > 0
                        THEN CAST(n * sxy - sx * sy AS DOUBLE)
                             / CAST(n * sxx - sx * sx AS DOUBLE)
                        ELSE 0.0 END AS slope_qp
            FROM s""",
        "priority_price_quartiles": """
            -- grouped INTERPOLATED quantiles (quantile_cont semantics)
            -- + upper-IQR outlier count; ranks selected explicitly with
            -- ROW_NUMBER and the interpolation replayed as the engine's
            -- exact IEEE expression (no reliance on quantile_cont
            -- internals)
            WITH t AS (SELECT o_orderpriority AS prio,
                              CAST(ROUND(o_totalprice * 100) AS BIGINT)
                                AS c
                       FROM orders),
            nn AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS n
                   FROM t GROUP BY 1),
            r AS (SELECT prio, c,
                         ROW_NUMBER() OVER (PARTITION BY prio
                                            ORDER BY c) - 1 AS rn
                  FROM t),
            sel AS (
              SELECT r.prio, MAX(nn.n) AS n,
                MAX(CASE WHEN rn = CAST(FLOOR(0.25*(nn.n-1)) AS BIGINT)
                         THEN c END) AS v1lo,
                MAX(CASE WHEN rn = LEAST(CAST(FLOOR(0.25*(nn.n-1))
                         AS BIGINT) + 1, nn.n - 1) THEN c END) AS v1hi,
                MAX(CASE WHEN rn = CAST(FLOOR(0.5*(nn.n-1)) AS BIGINT)
                         THEN c END) AS v2lo,
                MAX(CASE WHEN rn = LEAST(CAST(FLOOR(0.5*(nn.n-1))
                         AS BIGINT) + 1, nn.n - 1) THEN c END) AS v2hi,
                MAX(CASE WHEN rn = CAST(FLOOR(0.75*(nn.n-1)) AS BIGINT)
                         THEN c END) AS v3lo,
                MAX(CASE WHEN rn = LEAST(CAST(FLOOR(0.75*(nn.n-1))
                         AS BIGINT) + 1, nn.n - 1) THEN c END) AS v3hi
              FROM r JOIN nn ON nn.prio = r.prio GROUP BY r.prio),
            q AS (
              SELECT prio, n,
                CAST(v1lo AS DOUBLE) + (0.25*(n-1) - FLOOR(0.25*(n-1)))
                  * (CAST(v1hi AS DOUBLE) - CAST(v1lo AS DOUBLE)) AS q1,
                CAST(v2lo AS DOUBLE) + (0.5*(n-1) - FLOOR(0.5*(n-1)))
                  * (CAST(v2hi AS DOUBLE) - CAST(v2lo AS DOUBLE))
                  AS median,
                CAST(v3lo AS DOUBLE) + (0.75*(n-1) - FLOOR(0.75*(n-1)))
                  * (CAST(v3hi AS DOUBLE) - CAST(v3lo AS DOUBLE)) AS q3
              FROM sel)
            SELECT q.prio AS o_orderpriority, q.n, q.q1, q.median, q.q3,
                   CAST((SELECT COUNT(*) FROM t
                         WHERE t.prio = q.prio
                           AND CAST(t.c AS DOUBLE)
                               > q.q3 + 1.5 * (q.q3 - q.q1)) AS BIGINT)
                     AS n_outliers_hi
            FROM q""",
        "daily_new_users": """
            -- running COUNT(DISTINCT user) over time via first-seen
            -- days: new users per day + cumulative total
            WITH f AS (
              SELECT user_id, MIN(strftime(ts, '%Y-%m-%d')) AS day
              FROM events GROUP BY 1),
            d AS (
              SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new
              FROM f GROUP BY day)
            SELECT day, n_new,
                   CAST(SUM(n_new) OVER (ORDER BY day) AS BIGINT)
                     AS cum_users
            FROM d""",
        "user_mode_event": """
            -- grouped MODE with the tie-break pinned: each user's most
            -- frequent event type, ties -> lexicographically smallest
            WITH c AS (
              SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
            r AS (
              SELECT user_id, event_type, n,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                         ORDER BY n DESC, event_type ASC) AS rn
              FROM c)
            SELECT user_id, event_type AS mode_type, n AS n_type
            FROM r WHERE rn = 1""",
        "parts_churn": """
            -- EXCEPT: parts shipped in 1996 but never in 1997
            SELECT DISTINCT l_partkey FROM lineitem
            WHERE EXTRACT(year FROM l_shipdate) = 1996
              AND l_partkey NOT IN (
                SELECT l_partkey FROM lineitem
                WHERE EXTRACT(year FROM l_shipdate) = 1997)""",
        "above_segment_avg": """
            -- correlated-subquery shape: customers spending more than
            -- 1.5× their segment's average customer spend; the exact
            -- integer cross-multiplication both engines replay
            WITH sp AS (SELECT o_custkey,
                               CAST(SUM(CAST(ROUND(o_totalprice * 100)
                                             AS BIGINT)) AS BIGINT)
                                 AS spent_c
                        FROM orders GROUP BY 1),
            j AS (SELECT c.c_custkey, c.c_mktsegment, sp.spent_c
                  FROM sp JOIN customer c ON c.c_custkey = sp.o_custkey),
            seg AS (SELECT c_mktsegment,
                           CAST(SUM(spent_c) AS HUGEINT) AS ssum,
                           CAST(COUNT(*) AS HUGEINT) AS sn
                    FROM j GROUP BY 1)
            SELECT j.c_custkey, j.c_mktsegment, j.spent_c
            FROM j JOIN seg USING (c_mktsegment)
            WHERE CAST(j.spent_c AS HUGEINT) * 10 * seg.sn
                  > 15 * seg.ssum""",
        "price_histogram": """
            -- equi-width histogram of order totals ($50,000 buckets),
            -- exact integer cents
            SELECT CAST(price_c // 5000000 AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(price_c) AS BIGINT) AS revenue_c
            FROM (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT)
                    AS price_c FROM orders)
            GROUP BY 1""",
        "funnel_stages": """
            -- per-user funnel view → click → purchase with STRICT
            -- temporal ordering (first click after first view, first
            -- purchase after that click); stage 0 = never viewed
            WITH t1 AS (SELECT user_id, MIN(ts) AS t FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
            t2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
                   JOIN t1 ON t1.user_id = e.user_id
                   WHERE e.event_type = 'click' AND e.ts > t1.t
                   GROUP BY e.user_id),
            t3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
                   JOIN t2 ON t2.user_id = e.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > t2.t
                   GROUP BY e.user_id),
            u AS (SELECT DISTINCT user_id FROM events)
            SELECT u.user_id,
                   CAST(CASE WHEN t3.t IS NOT NULL THEN 3
                             WHEN t2.t IS NOT NULL THEN 2
                             WHEN t1.t IS NOT NULL THEN 1
                             ELSE 0 END AS BIGINT) AS stage
            FROM u
            LEFT JOIN t1 ON t1.user_id = u.user_id
            LEFT JOIN t2 ON t2.user_id = u.user_id
            LEFT JOIN t3 ON t3.user_id = u.user_id""",
        "customers_no_big_order": """
            -- anti-join: customers with no order above $350,000
            SELECT c.c_custkey, c.c_name,
                   CAST(ROUND(c.c_acctbal * 100) AS BIGINT)
                     AS c_acctbal_c
            FROM customer c
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 350000)""",
        "rollup_revenue": """
            -- GROUP BY ROLLUP with NULL-free sentinels ('ALL' / -1) so
            -- both engines hash the rolled-up rows identically
            SELECT COALESCE(n_name, 'ALL') AS n_name,
                   CAST(COALESCE(yr, -1) AS BIGINT) AS o_year,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(price_c) AS BIGINT) AS revenue_c
            FROM (SELECT n.n_name,
                         CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT)
                           AS yr,
                         CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                           AS price_c
                  FROM orders o
                  JOIN customer c ON c.c_custkey = o.o_custkey
                  JOIN nation n ON n.n_nationkey = c.c_nationkey)
            GROUP BY ROLLUP(n_name, yr)""",
        "region_revenue": """
            SELECT r.r_name, COUNT(*) AS n_orders,
                   SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) / 100.0
                     AS revenue
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name""",
        "brand_item_counts": """
            SELECT p.p_brand, COUNT(*) AS n_items
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_brand""",
        "high_value_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders WHERE o_totalprice > 400000.0""",
        "distinct_segments": """
            SELECT DISTINCT c_mktsegment FROM customer""",
        "supplier_balance_by_nation": """
            SELECT s_nationkey, ROUND(SUM(s_acctbal), 6) AS total_balance,
                   COUNT(*) AS n_suppliers
            FROM supplier GROUP BY s_nationkey""",
        "part_type_stats": """
            SELECT p_type, COUNT(*) AS n_parts,
                   ROUND(AVG(p_retailprice), 6) AS avg_price
            FROM part GROUP BY p_type""",
        "events_hourly": """
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1, 2""",
        "events_json_stats": """
            -- outer CAST: DuckDB SUM(BIGINT) yields HUGEINT which fetches
            -- as float64 and would hash-mismatch the engine's int64
            SELECT event_type,
                   CAST(SUM(CAST(json_extract_string(props, '$.k')
                                 AS BIGINT)) AS BIGINT) AS sum_k,
                   COUNT(*) AS n_events
            FROM events GROUP BY event_type""",
        "sessionize_events": """
            WITH gaps AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                          OR LAG(ts) OVER w IS NULL
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            sess AS (
              SELECT user_id,
                     SUM(brk) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) - 1 AS session_id
              FROM gaps)
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   COUNT(*) AS n_events
            FROM sess GROUP BY user_id, session_id""",
        "event_attribution": """
            -- as-of + range join. Tie-break PINNED on both sides: equal
            -- click timestamps resolve to the MAX event_id (engine:
            -- lexsort on (ts, event_id); oracle: arg_max over the
            -- HUGEINT composite ts*2^63 + event_id, exact since
            -- 0 <= event_id < 2^63)
            WITH c AS (SELECT user_id, ts, event_id FROM events
                       WHERE event_type = 'click'),
                 p AS (SELECT user_id, ts, event_id FROM events
                       WHERE event_type = 'purchase')
            SELECT p.event_id AS purchase_id, p.user_id,
                   COUNT(*) AS n_prior_clicks,
                   MAX(c.ts) AS last_click_ts,
                   arg_max(c.event_id,
                           epoch_us(c.ts)::HUGEINT
                             * 9223372036854775808::HUGEINT
                             + c.event_id) AS last_click_id
            FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
            GROUP BY 1, 2""",
        "events_rolling": """
            SELECT event_id, user_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn,
                   ROUND(SUM(value) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
                     AS roll_sum
            FROM events""",
        "events_interarrival": """
            -- per-user LEAD/LAG inter-arrival stats; consecutive-diff
            -- aggregates depend only on the sorted timestamp multiset,
            -- so tie order among equal ts cannot change them
            WITH g AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
            d AS (SELECT user_id, tus,
                    tus - lag(tus) OVER (PARTITION BY user_id
                                         ORDER BY tus) AS gap
                  FROM g)
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(MAX(tus) - MIN(tus) AS BIGINT) AS span_us,
                   CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_us
            FROM d GROUP BY user_id""",
        "segment_order_percentiles": """
            SELECT c_mktsegment, COUNT(*) AS n_orders,
                   ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
                   ROUND(quantile_cont(o_totalprice, 0.95), 6) AS p95
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1""",
        "event_intervals": """
            -- SCD-2 validity intervals: LEAD of ts within (user, type),
            -- open intervals closed by the 9999-01-01 sentinel
            SELECT user_id, event_type, event_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS value_c,
                   ts AS valid_from,
                   COALESCE(LEAD(ts) OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id),
                     TIMESTAMP '9999-01-01') AS valid_to
            FROM events""",
        "latest_events": """
            -- CDC compaction: newest event per (user, type) by
            -- (ts, event_id), value in exact cents
            SELECT user_id, event_type, event_id, ts,
                   CAST(ROUND(value * 100) AS BIGINT) AS value_c
            FROM (SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY user_id, event_type
                      ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1""",
        "asof_price_index": """
            -- broadcast as-of join: latest daily order-price index row
            -- at-or-before each lineitem's shipdate; index values are
            -- exact cent sums so the match is bit-stable
            WITH idx AS (
              SELECT o_orderdate AS day,
                     CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS idx_sum_c,
                     CAST(COUNT(*) AS BIGINT) AS idx_n
              FROM orders GROUP BY 1)
            SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT)
                     AS l_linenumber,
                   i.day AS idx_day, i.idx_sum_c, i.idx_n
            FROM lineitem l ASOF JOIN idx i ON l.l_shipdate >= i.day""",
        "sliding_median3": """
            -- trailing 3-row window median per user in doubled cents:
            -- values are 2-decimal, so 200*median is an exact integer on
            -- both sides (no quantile-interpolation float hazard)
            SELECT event_id, user_id,
                   CAST(ROUND(200 * median(value) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
                        AS BIGINT) AS med3_c2
            FROM events""",
        "ship_window_counts": """
            -- band join: lineitems (any order) shipped within 7 days of
            -- each order's date; dates are day-granular so the prefix
            -- histogram the engine broadcasts is exact
            SELECT o.o_orderkey,
                   CAST(COUNT(l.l_shipdate) AS BIGINT) AS n_shipped_7d
            FROM orders o LEFT JOIN lineitem l
              ON l.l_shipdate >= o.o_orderdate
             AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
            GROUP BY 1""",
        "customer_event_outer": """
            -- FULL OUTER reconciliation of two aggregates; absent sides
            -- are 0-coalesced with indicator bits, so no NULL reaches
            -- the hash compare
            WITH hv AS (
              SELECT o_custkey,
                     CAST(COUNT(*) AS BIGINT) AS hv_n,
                     CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS hv_sum_c
              FROM orders WHERE o_totalprice > 300000 GROUP BY 1),
            ev AS (
              SELECT user_id,
                     CAST(COUNT(*) AS BIGINT) AS ev_n,
                     CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                          AS BIGINT) AS ev_value_c
              FROM events GROUP BY 1)
            SELECT COALESCE(hv.o_custkey, ev.user_id) AS custkey,
                   COALESCE(hv.hv_n, 0) AS hv_n,
                   COALESCE(hv.hv_sum_c, 0) AS hv_sum_c,
                   COALESCE(ev.ev_n, 0) AS ev_n,
                   COALESCE(ev.ev_value_c, 0) AS ev_value_c,
                   CAST(hv.o_custkey IS NOT NULL AS BIGINT) AS has_hv,
                   CAST(ev.user_id IS NOT NULL AS BIGINT) AS has_ev
            FROM hv FULL OUTER JOIN ev ON hv.o_custkey = ev.user_id""",
        "events_range_window": """
            -- trailing time-RANGE frame per user: sum of values (cents)
            -- over ts in [ts - 10 min, ts]; RANGE includes peer rows
            SELECT event_id, user_id,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                        PARTITION BY user_id ORDER BY ts
                        RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS win_sum_c
            FROM events""",
        "orders_cube": """
            -- CUBE(status, priority): all four grouping sets, absent
            -- dimensions labeled 'ALL', exact cents
            SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
                   COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS revenue_c
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
        "docs_dense_topk": """
            -- DENSE_RANK grouped top-k: every doc tied on one of the
            -- language's top-2 distinct lengths qualifies
            SELECT doc_id, lang, n_chars, rnk FROM (
              SELECT doc_id, lang, n_chars,
                     DENSE_RANK() OVER (PARTITION BY lang
                         ORDER BY n_chars DESC) AS rnk
              FROM documents) WHERE rnk <= 2""",
        "order_lines_enriched": """
            -- row-level 3-way denormalization, exact cents
            SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT)
                     AS l_linenumber,
                   o.o_custkey, c.c_mktsegment,
                   CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                     AS price_c
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey""",
        "orders_profile": """
            -- one-pass numeric column profile, exact BIGINTs
            SELECT 'o_orderkey' AS column,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT)
                     AS n_nulls,
                   CAST(MIN(o_orderkey) AS BIGINT) AS min_v,
                   CAST(MAX(o_orderkey) AS BIGINT) AS max_v,
                   CAST(SUM(o_orderkey) AS BIGINT) AS sum_v
            FROM orders
            UNION ALL
            SELECT 'o_custkey', COUNT(*),
                   COUNT(*) - COUNT(o_custkey),
                   CAST(MIN(o_custkey) AS BIGINT),
                   CAST(MAX(o_custkey) AS BIGINT),
                   CAST(SUM(o_custkey) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'o_totalprice_c', COUNT(*),
                   COUNT(*) - COUNT(o_totalprice),
                   CAST(MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT),
                   CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT),
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT)
            FROM orders""",
        "nation_top_names": """
            -- grouped ORDERED string_agg: '|'-joined names of each
            -- nation's top-5 customers by (acctbal DESC, custkey ASC)
            WITH r AS (
              SELECT c_nationkey, c_name, c_custkey,
                     ROW_NUMBER() OVER (PARTITION BY c_nationkey
                         ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
              FROM customer)
            SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
                   CAST(COUNT(*) AS BIGINT) AS n_top,
                   string_agg(c_name, '|' ORDER BY rn) AS top_names
            FROM r WHERE rn <= 5 GROUP BY 1""",
        "parts_intersect": """
            -- INTERSECT: distinct parts shipped in both 1995 and 2000
            SELECT DISTINCT l_partkey FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate < TIMESTAMP '1996-01-01'
            INTERSECT
            SELECT DISTINCT l_partkey FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '2000-01-01'
              AND l_shipdate < TIMESTAMP '2001-01-01'""",
        "lineitem_melt": """
            -- UNPIVOT: wide per-returnflag aggregate melted to
            -- (l_returnflag, measure, value) long form, exact cents
            WITH w AS (
              SELECT l_returnflag,
                     CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
                          AS BIGINT) AS sum_qty_c,
                     CAST(SUM(CAST(ROUND(l_extendedprice * 100)
                                   AS BIGINT)) AS BIGINT) AS sum_price_c,
                     CAST(COUNT(*) AS BIGINT) AS n_rows
              FROM lineitem GROUP BY 1)
            SELECT l_returnflag, 'sum_qty_c' AS measure,
                   sum_qty_c AS value FROM w
            UNION ALL
            SELECT l_returnflag, 'sum_price_c', sum_price_c FROM w
            UNION ALL
            SELECT l_returnflag, 'n_rows', n_rows FROM w""",
        "order_deciles": """
            -- exact global NTILE(10) by (o_totalprice, o_orderkey),
            -- aggregated per tile in exact cents
            WITH t AS (
              SELECT ntile(10) OVER (ORDER BY o_totalprice, o_orderkey)
                       AS tile,
                     CAST(ROUND(o_totalprice * 100) AS BIGINT) AS p
              FROM orders)
            SELECT CAST(tile AS BIGINT) AS tile,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(p) AS BIGINT) AS sum_price_c
            FROM t GROUP BY 1""",
        "top_docs_per_group": """
            SELECT doc_id, lang, source, n_chars, rnk FROM (
              SELECT doc_id, lang, source, n_chars,
                     ROW_NUMBER() OVER (PARTITION BY lang, source
                         ORDER BY n_chars DESC, doc_id ASC) AS rnk
              FROM documents) WHERE rnk <= 3""",
        "train_val_split": _splitmix_split_sql(),
        "stratified_sample": _stratified_sample_sql(),
        "decontaminate": f"""
            -- train/val decontamination: distinct token trigrams shared
            -- across the split boundary (dedup.py::cross_split_overlap);
            -- split = the identical splitmix chain train_val_split pins,
            -- df cap 50 = the engine's max_df guard
            WITH sp AS ({_splitmix_split_sql()}),
            tokd AS (SELECT doc_id,
                            regexp_extract_all(text, '\\S+') AS toks
                     FROM documents),
            tri AS (SELECT doc_id,
                      toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                    FROM (SELECT doc_id, toks,
                            unnest(generate_series(1, len(toks) - 2)) AS i
                          FROM tokd)),
            dt AS (SELECT DISTINCT doc_id, g FROM tri),
            keep AS (SELECT g FROM dt GROUP BY g HAVING COUNT(*) <= 50)
            SELECT t.doc_id AS train_doc, v.doc_id AS val_doc,
                   CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM dt t
            JOIN keep k ON k.g = t.g
            JOIN dt v ON v.g = t.g
            JOIN sp st ON st.doc_id = t.doc_id AND st.split = 'train'
            JOIN sp sv ON sv.doc_id = v.doc_id AND sv.split = 'val'
            GROUP BY 1, 2""",
        "exact_dedup": """
            SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text""",
        "vocab_topk": """
            -- top-10 whitespace tokens per lang by total frequency
            -- (tie → term ASC); same '\\S+' token definition as doc_stats
            WITH tok AS (
              SELECT lang, unnest(regexp_extract_all(text, '\\S+')) AS term
              FROM documents),
            agg AS (
              SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS tf
              FROM tok GROUP BY 1, 2),
            rnk AS (
              SELECT lang, term, tf,
                     ROW_NUMBER() OVER (PARTITION BY lang
                         ORDER BY tf DESC, term ASC) AS rn
              FROM agg)
            SELECT lang, term, tf, CAST(rn AS BIGINT) AS rnk
            FROM rnk WHERE rn <= 10""",
        "vocab_editdist": f"""
            -- every unordered pair of distinct '\\S+' corpus-content
            -- vocabulary tokens at Levenshtein distance exactly 1
            -- (typo-variant detection; the engine computes this via
            -- FastSS deletion variants — the quadratic join here is the
            -- semantics, not the plan)
            WITH toks AS (
              SELECT DISTINCT unnest(regexp_extract_all(content, '\\S+'))
                     AS tok
              FROM read_parquet('{_CORPUS_001}'))
            SELECT a.tok AS tok_a, b.tok AS tok_b
            FROM toks a JOIN toks b
              ON a.tok < b.tok
             AND abs(length(a.tok) - length(b.tok)) <= 1
             AND levenshtein(a.tok, b.tok) = 1""",
        "tfidf_topk": """
            -- top-5 tf*ln(N/df) terms per doc (tie -> term ASC); same
            -- '\\S+' token definition as vocab_topk; score is the
            -- UNROUNDED double of the identical IEEE op chain
            -- (functions/text.py::tfidf_topk)
            WITH tok AS (
              SELECT doc_id, unnest(regexp_extract_all(text, '\\S+'))
                     AS term
              FROM documents),
            tfx AS (
              SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
              FROM tok GROUP BY 1, 2),
            dfx AS (
              SELECT term, CAST(COUNT(*) AS BIGINT) AS df
              FROM tfx GROUP BY 1),
            n AS (SELECT COUNT(*) AS n FROM documents),
            scored AS (
              SELECT t.doc_id, t.term, t.tf, d.df,
                     t.tf * LN(CAST(n.n AS DOUBLE) / d.df) AS score
              FROM tfx t JOIN dfx d USING (term) CROSS JOIN n),
            rnk AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                         ORDER BY score DESC, term ASC) AS rn
              FROM scored)
            SELECT doc_id, term, tf, df, score, CAST(rn AS BIGINT) AS rnk
            FROM rnk WHERE rn <= 5""",
        "redact_text": f"""
            -- PII-style scrub replayed stage by stage (same pattern
            -- order as functions/text.py::_REDACT — counts taken on the
            -- text as each stage sees it, so no double counting); runs
            -- over the CORPUS content, which carries numeric identifiers
            WITH s0 AS (SELECT repo, path, content AS t
                        FROM read_parquet('{_CORPUS_001}')),
            s1 AS (SELECT repo, path,
                     LEN(regexp_extract_all(t,
                         '[\\w.+-]+@[\\w-]+\\.[\\w.]+')) AS n1,
                     regexp_replace(t, '[\\w.+-]+@[\\w-]+\\.[\\w.]+',
                                    '<EMAIL>', 'g') AS t
                   FROM s0),
            s2 AS (SELECT repo, path, n1,
                     LEN(regexp_extract_all(t,
                         '\\b0x[0-9a-fA-F]+\\b')) AS n2,
                     regexp_replace(t, '\\b0x[0-9a-fA-F]+\\b',
                                    '<HEX>', 'g') AS t
                   FROM s1),
            s3 AS (SELECT repo, path, n1, n2,
                     LEN(regexp_extract_all(t, '\\d+')) AS n3,
                     regexp_replace(t, '\\d+', '<NUM>', 'g') AS t
                   FROM s2)
            SELECT repo, path,
                   CAST(n1 + n2 + n3 AS BIGINT) AS n_redactions,
                   sha256(t) AS redacted_sha
            FROM s3""",
        "weighted_sample": _weighted_sample_sql(),
        "doc_repetition": """
            -- Gopher-style repetition signals: exact integer n-gram
            -- counts + the identical IEEE int64→float64 quotients the
            -- engine computes (CAST to DOUBLE then divide)
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(text, '\\S+') AS t
              FROM documents),
            uni AS (
              SELECT doc_id, unnest(t) AS tok FROM toks),
            ucnt AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                     CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct
              FROM uni GROUP BY doc_id),
            bpos AS (
              SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks),
            bg AS (
              SELECT doc_id, t[i] || ' ' || t[i+1] AS g FROM bpos),
            bga AS (
              SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
                     CAST(MAX(c) AS BIGINT) AS top_bigram
              FROM (SELECT doc_id, g, COUNT(*) AS c FROM bg
                    GROUP BY doc_id, g) GROUP BY doc_id),
            tpos AS (
              SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
              FROM toks),
            tg AS (
              SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
              FROM tpos),
            tga AS (
              SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_trigrams,
                     CAST(MAX(c) AS BIGINT) AS top_trigram
              FROM (SELECT doc_id, g, COUNT(*) AS c FROM tg
                    GROUP BY doc_id, g) GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(u.n_tokens, 0) AS n_tokens,
                   COALESCE(u.n_distinct, 0) AS n_distinct,
                   COALESCE(b.n_bigrams, 0) AS n_bigrams,
                   COALESCE(b.top_bigram, 0) AS top_bigram,
                   COALESCE(t3.n_trigrams, 0) AS n_trigrams,
                   COALESCE(t3.top_trigram, 0) AS top_trigram,
                   CASE WHEN COALESCE(u.n_tokens, 0) > 0
                        THEN CAST(u.n_tokens - u.n_distinct AS DOUBLE)
                             / CAST(u.n_tokens AS DOUBLE)
                        ELSE 0.0 END AS dup_frac,
                   CASE WHEN COALESCE(b.n_bigrams, 0) > 0
                        THEN CAST(b.top_bigram AS DOUBLE)
                             / CAST(b.n_bigrams AS DOUBLE)
                        ELSE 0.0 END AS top_bigram_frac
            FROM documents d
            LEFT JOIN ucnt u ON d.doc_id = u.doc_id
            LEFT JOIN bga b ON d.doc_id = b.doc_id
            LEFT JOIN tga t3 ON d.doc_id = t3.doc_id""",
        "quality_filter": """
            -- filter by a COMPUTED global order statistic: docs with
            -- quality >= the 50th largest quality value (exact float,
            -- no interpolation; the quality chain is the bit-identical
            -- IEEE op sequence the quality_score oracle pins)
            WITH s AS (
              SELECT doc_id,
                0.4 * LEAST(GREATEST(n_tok / 100.0, 0), 1)
                + 0.4 * LEAST(GREATEST(n_stop / GREATEST(n_tok, 1.0) * 5,
                                       0), 1)
                + 0.2 * (1.0 - LEAST(GREATEST(
                      n_punct / GREATEST(n_chars, 1.0) * 10, 0), 1))
                  AS quality
              FROM (SELECT doc_id,
                      CAST(LENGTH(text) AS DOUBLE) AS n_chars,
                      CAST(LEN(regexp_extract_all(text, '\\S+'))
                        AS DOUBLE) AS n_tok,
                      CAST(LEN(regexp_extract_all(text, '[.,;:!?]'))
                        AS DOUBLE) AS n_punct,
                      CAST(LEN(regexp_extract_all(text,
                        '\\b(the|and|of|to|in|is|that|for|with|was)\\b'))
                        AS DOUBLE) AS n_stop
                    FROM documents)),
            th AS (SELECT quality AS v FROM s
                   ORDER BY quality DESC LIMIT 1 OFFSET 49)
            SELECT doc_id, quality FROM s
            WHERE quality >= (SELECT v FROM th)""",
        "bigram_topk": """
            -- top-10 token bigrams per lang (tie → bigram ASC); same
            -- '\\S+' token definition as vocab_topk, consecutive pairs
            WITH toks AS (
              SELECT lang, regexp_extract_all(text, '\\S+') AS t
              FROM documents),
            pos AS (
              SELECT lang, t, unnest(range(1, len(t))) AS i FROM toks),
            bg AS (
              SELECT lang, t[i] || ' ' || t[i+1] AS bigram FROM pos),
            agg AS (
              SELECT lang, bigram, CAST(COUNT(*) AS BIGINT) AS tf
              FROM bg GROUP BY lang, bigram),
            rk AS (
              SELECT lang, bigram, tf,
                     ROW_NUMBER() OVER (PARTITION BY lang
                         ORDER BY tf DESC, bigram ASC) AS rn
              FROM agg)
            SELECT lang, bigram, tf, CAST(rn AS BIGINT) AS rnk
            FROM rk WHERE rn <= 10""",
        "docs_global_rank": """
            -- distributed total-order rank (global ORDER BY + dense
            -- ROW_NUMBER via sorted blocks + per-block offsets)
            SELECT doc_id, n_chars,
                   ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id ASC)
                     AS rnk
            FROM documents""",
        "pack_sequences": """
            -- contiguous sequence packing: bin = global token prefix
            -- (ascending doc_id) // 2048, offset = prefix % 2048
            WITH t AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(text, '\\S+'))
                          AS BIGINT) AS n_tokens
              FROM documents),
            p AS (
              SELECT doc_id, n_tokens,
                     COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS start
              FROM t)
            SELECT doc_id, n_tokens,
                   CAST(start // 2048 AS BIGINT) AS bin,
                   CAST(start % 2048 AS BIGINT) AS bin_offset
            FROM p""",
        "prepare_corpus": """
            -- end-to-end prep composition: exact-dedup keepers AND
            -- quality >= 0.5, then contiguous packing of the survivors
            -- (each stage's protocol is pinned by its own oracle; this
            -- replays the chained semantics)
            WITH k AS (
              SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
            s AS (
              SELECT doc_id,
                0.4 * LEAST(GREATEST(n_tok / 100.0, 0), 1)
                + 0.4 * LEAST(GREATEST(n_stop / GREATEST(n_tok, 1.0) * 5,
                                       0), 1)
                + 0.2 * (1.0 - LEAST(GREATEST(
                      n_punct / GREATEST(n_chars, 1.0) * 10, 0), 1))
                  AS quality
              FROM (SELECT doc_id,
                      CAST(LENGTH(text) AS DOUBLE) AS n_chars,
                      CAST(LEN(regexp_extract_all(text, '\\S+'))
                        AS DOUBLE) AS n_tok,
                      CAST(LEN(regexp_extract_all(text, '[.,;:!?]'))
                        AS DOUBLE) AS n_punct,
                      CAST(LEN(regexp_extract_all(text,
                        '\\b(the|and|of|to|in|is|that|for|with|was)\\b'))
                        AS DOUBLE) AS n_stop
                    FROM documents)),
            e AS (
              SELECT k.doc_id FROM k
              JOIN s ON s.doc_id = k.doc_id
              WHERE s.quality >= 0.5),
            t AS (
              SELECT d.doc_id,
                     CAST(len(regexp_extract_all(d.text, '\\S+'))
                          AS BIGINT) AS n_tokens
              FROM documents d JOIN e ON e.doc_id = d.doc_id),
            p AS (
              SELECT doc_id, n_tokens,
                     COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS start
              FROM t)
            SELECT doc_id, n_tokens,
                   CAST(start // 2048 AS BIGINT) AS bin,
                   CAST(start % 2048 AS BIGINT) AS bin_offset
            FROM p""",
        "lineitem_ols": """
            -- exact distributed OLS sufficient statistics per flag:
            -- 2-decimal inputs ⟹ integer products, no quantization
            WITH t AS (SELECT l_returnflag,
                              CAST(ROUND(l_quantity * 100) AS BIGINT)
                                AS x,
                              CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                                AS y
                       FROM lineitem)
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sum_x,
                   CAST(SUM(y) AS BIGINT) AS sum_y,
                   CAST(SUM(x * y) AS BIGINT) AS sum_xy,
                   CAST(SUM(x * x) AS BIGINT) AS sum_xx
            FROM t GROUP BY 1""",
        "orders_status_pivot": """
            -- conditional aggregates (PIVOT): per year, count + exact
            -- revenue cents per status column
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)
                     AS o_year,
                   CAST(SUM(CASE WHEN o_orderstatus = 'O'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
                   CAST(SUM(CASE WHEN o_orderstatus = 'O'
                            THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS rev_O_c,
                   CAST(SUM(CASE WHEN o_orderstatus = 'F'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
                   CAST(SUM(CASE WHEN o_orderstatus = 'F'
                            THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS rev_F_c,
                   CAST(SUM(CASE WHEN o_orderstatus = 'P'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_P,
                   CAST(SUM(CASE WHEN o_orderstatus = 'P'
                            THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS rev_P_c
            FROM orders GROUP BY 1""",
        "event_type_pairs": """
            -- market-basket support: users performing BOTH types of
            -- each unordered pair
            WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM d a JOIN d b ON a.user_id = b.user_id
                             AND a.event_type < b.event_type
            GROUP BY 1, 2""",
        "retention_cohorts": """
            -- cohort retention: users by first-event week (Monday-
            -- aligned, date_trunc('week')), counted once per active week
            WITH f AS (SELECT user_id,
                              CAST(date_trunc('week', MIN(ts))
                                   AS TIMESTAMP) AS cohort_week
                       FROM events GROUP BY 1),
            a AS (SELECT DISTINCT user_id,
                         CAST(date_trunc('week', ts) AS TIMESTAMP)
                           AS week
                  FROM events)
            SELECT f.cohort_week, a.week,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM a JOIN f USING (user_id) GROUP BY 1, 2""",
        "zipf_sums": """
            -- per-lang Zipf log-log regression sums over the top-100
            -- terms: x = FLOOR(LN(rank)·2^20), y = FLOOR(LN(tf)·2^20),
            -- exact BIGINT sums (slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²))
            WITH tok AS (
              SELECT lang, unnest(regexp_extract_all(text, '\\S+'))
                       AS term
              FROM documents),
            agg AS (SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS tf
                    FROM tok GROUP BY 1, 2),
            rnk AS (SELECT lang, tf,
                           ROW_NUMBER() OVER (PARTITION BY lang
                               ORDER BY tf DESC, term ASC) AS rn
                    FROM agg),
            q AS (SELECT lang,
                    CAST(FLOOR(LN(CAST(rn AS DOUBLE)) * 1048576.0)
                         AS BIGINT) AS x,
                    CAST(FLOOR(LN(CAST(tf AS DOUBLE)) * 1048576.0)
                         AS BIGINT) AS y
                  FROM rnk WHERE rn <= 100)
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_terms,
                   CAST(SUM(x) AS BIGINT) AS sum_x,
                   CAST(SUM(y) AS BIGINT) AS sum_y,
                   CAST(SUM(x * x) AS BIGINT) AS sum_xx,
                   CAST(SUM(x * y) AS BIGINT) AS sum_xy
            FROM q GROUP BY lang""",
        "distinct_users_by_type": """
            -- exact grouped COUNT(DISTINCT)
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY event_type""",
        "events_hopping": """
            -- hopping windows (1h size, 30min hop): every event lands
            -- in two windows; window starts floored in exact µs
            WITH w AS (
              SELECT event_type,
                     make_timestamp(epoch_us(ts) // 1800000000
                                    * 1800000000) AS window_start
              FROM events
              UNION ALL
              SELECT event_type,
                     make_timestamp(epoch_us(ts) // 1800000000
                                    * 1800000000 - 1800000000)
              FROM events)
            SELECT event_type, window_start,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM w GROUP BY 1, 2""",
        "doc_entropy": """
            -- per-doc token Shannon entropy, quantized exact-int
            -- protocol: ent_q = Σ c·FLOOR(LN(c)·2^20) over per-doc
            -- distinct-token counts; entropy = LN(n) − ent_q/2^20/n
            -- in the identical IEEE chain
            WITH toks AS (
              SELECT doc_id, unnest(regexp_extract_all(text, '\\S+'))
                       AS tok
              FROM documents),
            cnt AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
                    FROM toks GROUP BY doc_id, tok),
            per AS (SELECT doc_id,
                      CAST(SUM(c) AS BIGINT) AS n_tokens,
                      CAST(SUM(c * CAST(FLOOR(LN(CAST(c AS DOUBLE))
                                              * 1048576.0) AS BIGINT))
                           AS BIGINT) AS ent_q
                    FROM cnt GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(p.n_tokens, 0) AS n_tokens,
                   COALESCE(p.ent_q, 0) AS ent_q,
                   CASE WHEN COALESCE(p.n_tokens, 0) > 0
                        THEN LN(CAST(p.n_tokens AS DOUBLE))
                             - CAST(p.ent_q AS DOUBLE) / 1048576.0
                               / CAST(p.n_tokens AS DOUBLE)
                        ELSE 0.0 END AS entropy
            FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id""",
        "embedding_centroids": """
            -- per-label quantized centroid sums: FLOOR(x·2^20) per
            -- element (float32→double exact, power-of-two scale), exact
            -- BIGINT dimension sums; parallel UNNEST pairs element with
            -- its 1-based ordinal
            WITH u AS (SELECT label,
                              UNNEST(embedding) AS e,
                              UNNEST(range(1, len(embedding) + 1)) AS dim
                       FROM embeddings)
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(dim AS BIGINT) AS dim,
                   CAST(SUM(CAST(FLOOR(CAST(e AS DOUBLE) * 1048576.0)
                                 AS BIGINT)) AS BIGINT) AS sum_q,
                   CAST(COUNT(*) AS BIGINT) AS n_vecs
            FROM u GROUP BY 1, 2""",
        "doc_surprisal": """
            -- unigram-LM surprisal with the quantized exact-int
            -- protocol: q(t) = FLOOR(LN(N/c) * 2^20) computed once per
            -- vocab entry (identical IEEE chain), per-doc SUM of
            -- int64 — order-independent on both sides
            WITH toks AS (
              SELECT doc_id, unnest(regexp_extract_all(text, '\\S+'))
                       AS tok
              FROM documents),
            cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
                    FROM toks GROUP BY tok),
            tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM cnt),
            q AS (SELECT tok,
                    CAST(FLOOR(LN((SELECT n FROM tot)
                                  / CAST(c AS DOUBLE)) * 1048576.0)
                         AS BIGINT) AS q
                  FROM cnt),
            per AS (SELECT t.doc_id,
                      CAST(COUNT(*) AS BIGINT) AS n_tokens,
                      CAST(SUM(q.q) AS BIGINT) AS surprisal_q
                    FROM toks t JOIN q ON q.tok = t.tok
                    GROUP BY t.doc_id)
            SELECT d.doc_id,
                   COALESCE(p.n_tokens, 0) AS n_tokens,
                   COALESCE(p.surprisal_q, 0) AS surprisal_q,
                   CASE WHEN COALESCE(p.n_tokens, 0) > 0
                        THEN CAST(p.surprisal_q AS DOUBLE) / 1048576.0
                             / CAST(p.n_tokens AS DOUBLE)
                        ELSE 0.0 END AS avg_surprisal
            FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id""",
        "boilerplate_lines": f"""
            -- cross-file boilerplate scrub: lines in >= 3 distinct
            -- files removed, document rebuilt from surviving lines in
            -- order, sha256 of the rebuilt text (corpus rows are unique
            -- per (repo, path), verified by corpus_sha256)
            WITH c AS (SELECT repo, path, content
                       FROM read_parquet('{_CORPUS_001}')),
            l AS (SELECT repo, path,
                    unnest(string_split(content, chr(10))) AS line,
                    generate_subscripts(
                      string_split(content, chr(10)), 1) AS ord
                  FROM c),
            freq AS (SELECT line FROM (
                       SELECT line,
                              COUNT(DISTINCT repo || chr(10) || path)
                                AS nf
                       FROM l GROUP BY line) WHERE nf >= 3),
            kept AS (SELECT repo, path, ord, line FROM l
                     WHERE line NOT IN (SELECT line FROM freq)),
            reb AS (SELECT repo, path,
                      CAST(COUNT(*) AS BIGINT) AS n_kept,
                      string_agg(line, chr(10) ORDER BY ord) AS cleaned
                    FROM kept GROUP BY repo, path),
            base AS (SELECT repo, path,
                       CAST(len(string_split(content, chr(10)))
                            AS BIGINT) AS n_lines
                     FROM c)
            SELECT b.repo, b.path, b.n_lines,
                   b.n_lines - COALESCE(r.n_kept, 0) AS n_removed,
                   sha256(COALESCE(r.cleaned, '')) AS cleaned_sha
            FROM base b LEFT JOIN reb r
              ON b.repo = r.repo AND b.path = r.path""",
        "doc_stats": """
            SELECT doc_id, LENGTH(text) AS n_chars,
                   LEN(regexp_extract_all(text, '\\S+')) AS n_tokens,
                   LEN(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
            FROM documents""",
        "doc_stats_jsonl": """
            -- JSONL round-trip parity: identical stats SQL over the
            -- parquet original; the engine computed from a JSONL copy
            SELECT doc_id, LENGTH(text) AS n_chars,
                   LEN(regexp_extract_all(text, '\\S+')) AS n_tokens,
                   LEN(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
            FROM documents""",
        "events_hourly_csv": """
            -- CSV round-trip parity: hourly counts + exact cent sums
            SELECT date_trunc('hour', ts) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                        AS BIGINT) AS value_c
            FROM events GROUP BY 1""",
        "bpe_tokens": """
            -- BPE-ish pre-tokenizer counts; DuckDB and Arrow both
            -- compile the pattern with RE2, so counts agree exactly
            SELECT doc_id, LENGTH(text) AS n_chars,
                   CAST(LEN(regexp_extract_all(text,
                        '''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+'
                        || '| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+'))
                        AS BIGINT) AS n_bpe_tokens
            FROM documents""",
        "embedding_quantize": """
            -- per-vector max-abs int8 quantization, LONG layout; the
            -- floor(x/s*127 + 0.5) chain over DOUBLE-cast float32
            -- components is the engine's identical IEEE expression
            WITH t AS (
              SELECT vec_id,
                     list_max(list_transform(embedding,
                         x -> abs(CAST(x AS DOUBLE)))) AS s,
                     unnest(embedding) AS v,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings)
            SELECT vec_id, CAST(i AS BIGINT) AS dim,
                   CAST(CASE WHEN s = 0 THEN 0
                        ELSE FLOOR(CAST(v AS DOUBLE) / s
                                   * 127 + 0.5) END AS BIGINT) AS qval,
                   s AS scale
            FROM t""",
        "distinct_kmv": f"""
            -- KMV sketch protocol replay: the identical splitmix chain
            -- (seed 101) over distinct user_ids, k-th minimum hash,
            -- exact HUGEINT floor-div estimate; < k hashes ⟹ the
            -- sketch IS the exact count (both sides take this branch
            -- identically)
            WITH ids AS (SELECT DISTINCT user_id AS v FROM events),
            s0 AS (SELECT v, (CAST(v AS HUGEINT)
                   + {(0x9E3779B97F4A7C15 * 101) % (1 << 64)})
                   % {1 << 64} AS x FROM ids),
            s1 AS (SELECT v, CAST(xor(CAST(x AS UBIGINT),
                   CAST(x AS UBIGINT) >> 30) AS HUGEINT) AS x FROM s0),
            s2 AS (SELECT v, ((x % 4294967296) * {0xBF58476D1CE4E5B9}
                   + ((((x // 4294967296) * {0xBF58476D1CE4E5B9})
                   % 4294967296) * 4294967296)) % {1 << 64} AS x
                   FROM s1),
            s3 AS (SELECT xor(CAST(x AS UBIGINT),
                   CAST(x AS UBIGINT) >> 27) AS h FROM s2),
            hs AS (SELECT DISTINCT h FROM s3),
            kth AS (SELECT h FROM hs ORDER BY h ASC
                    LIMIT 1 OFFSET 63)
            SELECT CAST((SELECT COUNT(*) FROM ids) AS BIGINT)
                     AS n_exact,
                   CAST(64 AS BIGINT) AS k_used,
                   CAST(CASE WHEN (SELECT COUNT(*) FROM hs) < 64
                        THEN (SELECT COUNT(*) FROM hs)
                        ELSE (63 * CAST('18446744073709551616'
                                        AS HUGEINT))
                             // (SELECT CAST(h AS HUGEINT) FROM kth)
                        END AS BIGINT) AS kmv_estimate""",
        "distinct_hll_by_type": f"""
            -- per-group HyperLogLog replay: the distinct_hll protocol
            -- with one register bank per event_type
            WITH ev AS (SELECT event_type AS g, user_id AS v FROM events),
            s0 AS (SELECT g, (CAST(v AS HUGEINT) + 17754115434574872255)
                   % 18446744073709551616 AS x FROM ev),
            s1 AS (SELECT g, CAST(xor(CAST(x AS UBIGINT),
                   CAST(x AS UBIGINT) >> 30) AS HUGEINT) AS x FROM s0),
            s2 AS (SELECT g, ((x % 4294967296) * 13787848793156543929
                   + ((((x // 4294967296) * 13787848793156543929)
                   % 4294967296) * 4294967296)) % 18446744073709551616 AS x
                   FROM s1),
            s3 AS (SELECT g, CAST(xor(CAST(x AS UBIGINT),
                   CAST(x AS UBIGINT) >> 27) AS HUGEINT) AS x FROM s2),
            s4 AS (SELECT g, ((x % 4294967296) * 10723151780598845931
                   + ((((x // 4294967296) * 10723151780598845931)
                   % 4294967296) * 4294967296)) % 18446744073709551616 AS x
                   FROM s3),
            s5 AS (SELECT g, CAST(xor(CAST(x AS UBIGINT),
                   CAST(x AS UBIGINT) >> 31) AS HUGEINT) AS h FROM s4),
            regs AS (SELECT g, CAST(h // 576460752303423488 AS BIGINT) AS reg,
                            CAST(h % 576460752303423488 AS BIGINT) AS w FROM s5),
            rk AS (SELECT g, reg, MAX(CASE WHEN w = 0 THEN 60
                                           ELSE 60 - LENGTH(bin(w)) END)
                            AS mx
                   FROM regs GROUP BY g, reg),
            agg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_present,
                           CAST(SUM(mx) AS BIGINT) AS rank_sum,
                           SUM(CAST(CAST(1 AS BIGINT) << (62 - mx)
                                    AS HUGEINT)) AS s_present
                    FROM rk GROUP BY g),
            fin AS (SELECT g, 32 - n_present AS v0, rank_sum,
                           s_present + CAST(32 - n_present AS HUGEINT)
                             * 4611686018427387904 AS s_exact
                    FROM agg),
            ex AS (SELECT event_type AS g,
                          CAST(COUNT(DISTINCT user_id) AS BIGINT)
                            AS n_exact
                   FROM events GROUP BY 1)
            SELECT fin.g AS event_type, ex.n_exact,
                   CAST(32 AS BIGINT) AS m,
                   CAST(v0 AS BIGINT) AS n_zero_regs, rank_sum,
                   CASE WHEN 0.697 * 32 * 32 * 4.611686018427388e+18
                             / CAST(s_exact AS DOUBLE) <= 80.0
                             AND v0 > 0
                        THEN 32 * ln(CAST(32 AS DOUBLE) / v0)
                        ELSE 0.697 * 32 * 32 * 4.611686018427388e+18
                             / CAST(s_exact AS DOUBLE)
                   END AS hll_estimate
            FROM fin JOIN ex ON ex.g = fin.g""",
        "distinct_hll": f"""
            -- HyperLogLog protocol replay: identical splitmix chain
            -- (seed 131), register = top-5 hash bits, rank = 60 −
            -- bitlength of the low-59-bit word (exact via bin(), no
            -- float log2), Σ 2^(−M_j) scaled by 2^62 into an exact
            -- HUGEINT, and both estimator branches (raw / linear
            -- counting) pinned to the engine's IEEE expression order
            WITH ids AS (SELECT user_id AS v FROM events),
            s0 AS (SELECT (CAST(v AS HUGEINT)
                   + {(0x9E3779B97F4A7C15 * 131) % (1 << 64)})
                   % {1 << 64} AS x FROM ids),
            s1 AS (SELECT CAST(xor(CAST(x AS UBIGINT),
                   CAST(x AS UBIGINT) >> 30) AS HUGEINT) AS x FROM s0),
            s2 AS (SELECT ((x % 4294967296) * {0xBF58476D1CE4E5B9}
                   + ((((x // 4294967296) * {0xBF58476D1CE4E5B9})
                   % 4294967296) * 4294967296)) % {1 << 64} AS x
                   FROM s1),
            s3 AS (SELECT CAST(xor(CAST(x AS UBIGINT),
                   CAST(x AS UBIGINT) >> 27) AS HUGEINT) AS x FROM s2),
            s4 AS (SELECT ((x % 4294967296) * {0x94D049BB133111EB}
                   + ((((x // 4294967296) * {0x94D049BB133111EB})
                   % 4294967296) * 4294967296)) % {1 << 64} AS x
                   FROM s3),
            s5 AS (SELECT CAST(xor(CAST(x AS UBIGINT),
                   CAST(x AS UBIGINT) >> 31) AS HUGEINT) AS h FROM s4),
            regs AS (SELECT CAST(h // {1 << 59} AS BIGINT) AS reg,
                            CAST(h % {1 << 59} AS BIGINT) AS w FROM s5),
            rk AS (SELECT reg, MAX(CASE WHEN w = 0 THEN 60
                                        ELSE 60 - LENGTH(bin(w)) END)
                            AS mx
                   FROM regs GROUP BY reg),
            agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_present,
                           CAST(SUM(mx) AS BIGINT) AS rank_sum,
                           SUM(CAST(CAST(1 AS BIGINT) << (62 - mx)
                                    AS HUGEINT)) AS s_present
                    FROM rk),
            fin AS (SELECT 32 - n_present AS v0, rank_sum,
                           s_present + CAST(32 - n_present AS HUGEINT)
                             * {1 << 62} AS s_exact
                    FROM agg)
            SELECT CAST((SELECT COUNT(DISTINCT v) FROM ids) AS BIGINT)
                     AS n_exact,
                   CAST(32 AS BIGINT) AS m,
                   CAST(v0 AS BIGINT) AS n_zero_regs,
                   rank_sum,
                   CASE WHEN 0.697 * 32 * 32 * {float(1 << 62)!r}
                             / CAST(s_exact AS DOUBLE) <= 80.0
                             AND v0 > 0
                        THEN 32 * ln(CAST(32 AS DOUBLE) / v0)
                        ELSE 0.697 * 32 * 32 * {float(1 << 62)!r}
                             / CAST(s_exact AS DOUBLE)
                   END AS hll_estimate
            FROM fin""",
        "heavy_hitters": """
            -- exact global token top-40 (the engine's MG sketch +
            -- verify pass certifies equality with this plain count)
            WITH toks AS (
              SELECT unnest(regexp_extract_all(text, '\\S+')) AS term
              FROM documents),
            cnts AS (SELECT term, COUNT(*) AS cnt FROM toks
                     GROUP BY term),
            rk AS (SELECT term, CAST(cnt AS BIGINT) AS cnt,
                          ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC)
                            AS rnk
                   FROM cnts)
            SELECT term, cnt, CAST(rnk AS BIGINT) AS rnk
            FROM rk WHERE rnk <= 40""",
        "dup_clusters": """
            -- connected components over the exact near-dup pairs:
            -- cluster = min vec_id reachable through the undirected dup
            -- graph (transitive closure), keeper = the minimum itself
            WITH RECURSIVE pr AS (
              SELECT a.vec_id AS u, b.vec_id AS w
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE list_cosine_similarity(
                  CAST(a.embedding AS DOUBLE[]),
                  CAST(b.embedding AS DOUBLE[])) >= 0.45),
            sym AS (SELECT u, w FROM pr UNION SELECT w, u FROM pr),
            reach(a, b) AS (
              SELECT u, w FROM sym
              UNION
              SELECT r.a, s.w FROM reach r JOIN sym s ON s.u = r.b),
            mn AS (SELECT a, MIN(b) AS m FROM reach GROUP BY a)
            SELECT e.vec_id,
                   CAST(LEAST(e.vec_id, COALESCE(mn.m, e.vec_id))
                        AS BIGINT) AS cluster,
                   CAST(CASE WHEN LEAST(e.vec_id,
                            COALESCE(mn.m, e.vec_id)) = e.vec_id
                        THEN 1 ELSE 0 END AS BIGINT) AS keeper
            FROM embeddings e LEFT JOIN mn ON mn.a = e.vec_id""",
        "embedding_dups_exact": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   ROUND(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(
                CAST(a.embedding AS DOUBLE[]),
                CAST(b.embedding AS DOUBLE[])) >= 0.45""",
        "quality_score": """
            -- mirrors _quality_batch exactly: every ratio/score is a chain
            -- of single IEEE float64 ops in the same association order, so
            -- the values are bit-identical, not just close
            SELECT doc_id,
              0.4 * LEAST(GREATEST(n_tok / 100.0, 0), 1)
              + 0.4 * LEAST(GREATEST(n_stop / GREATEST(n_tok, 1.0) * 5,
                                     0), 1)
              + 0.2 * (1.0 - LEAST(GREATEST(
                    n_punct / GREATEST(n_chars, 1.0) * 10, 0), 1))
                AS quality,
              n_stop / GREATEST(n_tok, 1.0) AS stop_ratio,
              n_punct / GREATEST(n_chars, 1.0) AS punct_ratio,
              CASE WHEN n_tok > 0
                   THEN (n_chars - (n_tok - 1)) / GREATEST(n_tok, 1.0)
                   ELSE 0 END AS mean_token_len
            FROM (SELECT doc_id,
                    CAST(LENGTH(text) AS DOUBLE) AS n_chars,
                    CAST(LEN(regexp_extract_all(text, '\\S+')) AS DOUBLE)
                      AS n_tok,
                    CAST(LEN(regexp_extract_all(text, '[.,;:!?]'))
                      AS DOUBLE) AS n_punct,
                    CAST(LEN(regexp_extract_all(text,
                      '\\b(the|and|of|to|in|is|that|for|with|was)\\b'))
                      AS DOUBLE) AS n_stop
                  FROM documents)""",
        "language_id": """
            -- argmax over stopword-hit counts (same denominator per row, so
            -- count order == ratio order); the >= chain replicates
            -- np.argmax's first-max tie-break in en,de,fr,es order; CJK
            -- override last, unknown when no profile hits
            SELECT doc_id,
              CASE WHEN cjk > 0 THEN 'zh'
                   WHEN GREATEST(en, de, fr, es) = 0 THEN 'unknown'
                   WHEN en >= de AND en >= fr AND en >= es THEN 'en'
                   WHEN de >= fr AND de >= es THEN 'de'
                   WHEN fr >= es THEN 'fr'
                   ELSE 'es' END AS lang_pred
            FROM (SELECT doc_id,
              LEN(regexp_extract_all(text,
                '\\b(the|and|of|to|in|is|that|for|with|was)\\b')) AS en,
              LEN(regexp_extract_all(text,
                '\\b(der|die|das|und|ist|nicht|von|mit|den|ein)\\b')) AS de,
              LEN(regexp_extract_all(text,
                '\\b(le|la|les|et|est|pas|des|une|dans|pour)\\b')) AS fr,
              LEN(regexp_extract_all(text,
                '\\b(el|la|los|las|es|y|de|que|en|por)\\b')) AS es,
              LEN(regexp_extract_all(text, '[一-鿿]')) AS cjk
              FROM documents)""",
        "kmeans_quantized": _kmeans_sql(),
        "knn_brute": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding
                       FROM embeddings WHERE vec_id < 10),
            scored AS (
              SELECT ROW_NUMBER() OVER (ORDER BY q.query_id) - 1 AS rn0,
                     q.query_id, v.vec_id AS neighbor_id,
                     list_cosine_similarity(q.embedding, v.embedding) AS s
              FROM q CROSS JOIN embeddings v),
            ranked AS (
              SELECT query_id, neighbor_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY s DESC, neighbor_id ASC)
                       AS rank
              FROM scored)
            SELECT DENSE_RANK() OVER (ORDER BY query_id) - 1 AS query_id,
                   neighbor_id, rank
            FROM ranked WHERE rank <= 5""",
        # media_decode: the engine decodes real PPM payloads whose geometry
        # follows a closed form of the media_id (multimodal._image_dims);
        # the oracle recomputes the geometry directly without a decoder.
        "media_decode": """
            SELECT i AS media_id,
                   CAST(16 + (i * 7) % 48 AS INTEGER) AS height,
                   CAST(16 + (i * 5) % 40 AS INTEGER) AS width,
                   CAST(3 AS INTEGER) AS channels
            FROM range(0, 64) t(i)""",
        "corpus_sha256": f"""
            SELECT repo, path, "commit", sha256(content) AS sha256
            FROM read_parquet('{_CORPUS_001}')""",
        "cocommit_pairs": f"""
            SELECT a.repo AS src_repo, a.path AS src_path,
                   b.repo AS dst_repo, b.path AS dst_path,
                   COUNT(*) AS weight
            FROM read_parquet('{_CORPUS_001}') a
            JOIN read_parquet('{_CORPUS_001}') b
              ON a.repo = b.repo AND a."commit" = b."commit"
             AND a.path < b.path
            GROUP BY 1, 2, 3, 4""",
        "import_pairs": f"""
            WITH {_CORPUS_CTE}
            SELECT src_repo, src_path, dst_repo, dst_path
            FROM import_edges""",
        "degree_topk": f"""
            WITH {_CORPUS_CTE},
            both_dirs AS (
              SELECT key_a AS key FROM canon
              UNION ALL SELECT key_b FROM canon),
            deg AS (
              SELECT key, COUNT(*) AS degree FROM both_dirs GROUP BY key)
            SELECT split_part(key, '|', 1) AS repo,
                   split_part(key, '|', 2) AS path, degree
            FROM deg
            ORDER BY degree DESC, repo ASC, path ASC
            LIMIT 10""",
        "graph_degree_hist": f"""
            -- exact degree-frequency histogram incl. degree 0: the
            -- canonical edge set counted from both directions, LEFT
            -- JOINed onto the full file set
            WITH {_CORPUS_CTE},
            both_dirs AS (
              SELECT key_a AS key FROM canon
              UNION ALL SELECT key_b FROM canon),
            deg AS (
              SELECT key, COUNT(*) AS degree FROM both_dirs GROUP BY key),
            perv AS (
              SELECT CAST(COALESCE(d.degree, 0) AS BIGINT) AS degree
              FROM files f
              LEFT JOIN deg d ON d.key = f.repo || '|' || f.path)
            SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_vertices
            FROM perv GROUP BY degree""",
        "graph_pagerank_fixed": _pagerank_fixed_sql(),
        "graph_hits": _hits_sql(),
        "graph_ppr": _ppr_sql(),
        "repo_pagerank": _repo_pagerank_sql(),
        "graph_ktruss": _ktruss_sql(),
        "graph_walks": _walks_sql(),
        "graph_scc": f"""
            -- strongly connected components of the DIRECTED import
            -- graph: scc(v) = min id mutually reachable with v
            -- (including v); transitive closure + pair intersection —
            -- exact, no unroll depth (algorithms/scc.py assigns the
            -- identical min-member label)
            WITH RECURSIVE {_CORPUS_CTE},
            vid AS (
              SELECT repo || '|' || path AS key,
                     ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v
              FROM files),
            de AS (
              SELECT vs.v AS u, vd.v AS t FROM import_edges e
              JOIN vid vs ON vs.key = e.src_repo || '|' || e.src_path
              JOIN vid vd ON vd.key = e.dst_repo || '|' || e.dst_path),
            reach(a, b) AS (
              SELECT u, t FROM de
              UNION
              SELECT r.a, d.t FROM reach r JOIN de d ON d.u = r.b),
            mutual AS (
              SELECT r1.a AS u, r1.b AS v
              FROM reach r1 JOIN reach r2
                ON r2.a = r1.b AND r2.b = r1.a)
            SELECT vid.v AS vertex,
                   CAST(LEAST(vid.v, COALESCE(m.mn, vid.v)) AS BIGINT)
                     AS scc
            FROM vid
            LEFT JOIN (SELECT u, MIN(v) AS mn FROM mutual GROUP BY u) m
              ON m.u = vid.v""",
        "graph_import_depth": f"""
            -- dependency depth on the SCC condensation DAG: scc labels
            -- via the same transitive-closure mutual-reachability as
            -- graph_scc, cross-SCC edges deduplicated, depth(c) =
            -- longest path ending at c (path-length enumeration + MAX;
            -- terminates because the condensation is acyclic)
            WITH RECURSIVE {_CORPUS_CTE},
            vid AS (
              SELECT repo || '|' || path AS key,
                     ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v
              FROM files),
            de AS (
              SELECT vs.v AS u, vd.v AS t FROM import_edges e
              JOIN vid vs ON vs.key = e.src_repo || '|' || e.src_path
              JOIN vid vd ON vd.key = e.dst_repo || '|' || e.dst_path),
            reach(a, b) AS (
              SELECT u, t FROM de
              UNION
              SELECT r.a, d.t FROM reach r JOIN de d ON d.u = r.b),
            mutual AS (
              SELECT r1.a AS u, r1.b AS v
              FROM reach r1 JOIN reach r2
                ON r2.a = r1.b AND r2.b = r1.a),
            sccl AS (
              SELECT vid.v AS vertex,
                     CAST(LEAST(vid.v, COALESCE(m.mn, vid.v)) AS BIGINT)
                       AS scc
              FROM vid
              LEFT JOIN (SELECT u, MIN(v) AS mn FROM mutual GROUP BY u) m
                ON m.u = vid.v),
            ce AS (
              SELECT DISTINCT s1.scc AS a, s2.scc AS b
              FROM de
              JOIN sccl s1 ON s1.vertex = de.u
              JOIN sccl s2 ON s2.vertex = de.t
              WHERE s1.scc <> s2.scc),
            paths(c, d) AS (
              SELECT b, 1 FROM ce
              UNION
              SELECT ce.b, p.d + 1 FROM paths p JOIN ce ON ce.a = p.c),
            dep AS (SELECT c, MAX(d) AS depth FROM paths GROUP BY c)
            SELECT s.vertex, s.scc,
                   CAST(COALESCE(dep.depth, 0) AS BIGINT) AS depth
            FROM sccl s LEFT JOIN dep ON dep.c = s.scc""",
        "graph_labelprop": _labelprop_sql(),
        "graph_mis": _mis_sql(),
        "graph_coloring": _coloring_sql(),
        "graph_reciprocity": f"""
            -- directed-edge reciprocity over the distinct import pairs
            -- (self-imports excluded from the metric)
            WITH {_CORPUS_CTE},
            vid AS MATERIALIZED (SELECT repo || '|' || path AS key,
                    ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v
                  FROM files),
            de AS MATERIALIZED (
              SELECT DISTINCT vs.v AS u, vd.v AS t FROM import_edges e
              JOIN vid vs ON vs.key = e.src_repo || '|' || e.src_path
              JOIN vid vd ON vd.key = e.dst_repo || '|' || e.dst_path),
            nz AS (SELECT u, t FROM de WHERE u <> t),
            r AS (SELECT a.u FROM nz a
                  JOIN nz b ON a.u = b.t AND a.t = b.u)
            SELECT CAST((SELECT COUNT(*) FROM nz) AS BIGINT) AS n_edges,
                   CAST((SELECT COUNT(*) FROM r) AS BIGINT)
                     AS n_reciprocated,
                   CASE WHEN (SELECT COUNT(*) FROM nz) > 0
                        THEN CAST((SELECT COUNT(*) FROM r) AS DOUBLE)
                             / CAST((SELECT COUNT(*) FROM nz) AS DOUBLE)
                        ELSE 0.0 END AS reciprocity""",
        "graph_matching": _matching_sql(),
        "graph_sssp": _sssp_sql(),
        "graph_diameter": f"""
            -- double-sweep pseudo-diameter: BFS from 0 -> farthest a
            -- (tie -> min id), BFS from a -> eccentricity; same argmax
            -- tie-break as the engine (dist DESC, vertex ASC)
            WITH RECURSIVE {_CORPUS_CTE},
            vid AS (
              SELECT repo || '|' || path AS key,
                     ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v
              FROM files),
            e AS (
              SELECT va.v AS u, vb.v AS w
              FROM canon c
              JOIN vid va ON va.key = c.key_a
              JOIN vid vb ON vb.key = c.key_b),
            sym AS (
              SELECT u, w FROM e UNION SELECT w, u FROM e),
            w1(v, d) AS (
              SELECT CAST(0 AS BIGINT), 0
              UNION
              SELECT s.u, r.d + 1 FROM w1 r JOIN sym s ON s.w = r.v
              WHERE r.d < 64),
            d1 AS (SELECT v, MIN(d) AS d FROM w1 GROUP BY v),
            fa AS (SELECT v, d FROM d1 ORDER BY d DESC, v ASC LIMIT 1),
            w2(v, d) AS (
              SELECT (SELECT v FROM fa), 0
              UNION
              SELECT s.u, r.d + 1 FROM w2 r JOIN sym s ON s.w = r.v
              WHERE r.d < 64),
            d2 AS (SELECT v, MIN(d) AS d FROM w2 GROUP BY v),
            fb AS (SELECT v, d FROM d2 ORDER BY d DESC, v ASC LIMIT 1)
            SELECT CAST((SELECT v FROM fa) AS BIGINT) AS far_a,
                   CAST((SELECT d FROM fa) AS BIGINT) AS ecc_0,
                   CAST((SELECT v FROM fb) AS BIGINT) AS far_b,
                   CAST((SELECT d FROM fb) AS BIGINT) AS diameter_lb""",

        "graph_spcount": _spcount_sql(),
        "graph_betweenness": _betweenness_sql(),
        "graph_weight_hist": f"""
            -- exact canonical-edge weight histogram (weights are
            -- integer co-occurrence counts; imports weigh 1)
            WITH {_CORPUS_CTE},
            wpair AS (
              SELECT src_repo||'|'||src_path AS ks,
                     dst_repo||'|'||dst_path AS kd,
                     CAST(1 AS BIGINT) AS w FROM import_edges
              UNION ALL
              SELECT src_repo||'|'||src_path, dst_repo||'|'||dst_path,
                     CAST(weight AS BIGINT) FROM cocommit_edges),
            wedge AS (
              SELECT LEAST(ks, kd) AS ka, GREATEST(ks, kd) AS kb,
                     CAST(SUM(w) AS BIGINT) AS w
              FROM wpair GROUP BY 1, 2)
            SELECT w AS weight, CAST(COUNT(*) AS BIGINT) AS n_edges
            FROM wedge GROUP BY 1""",
        "video_frame_stats": """
            -- closed-form recompute of the decoded y4m frame content:
            -- media i has h = 16 + (i%3)·8, w = 16, nf = 4 + i%3 Cmono
            -- frames with pixel (r,c) of frame f = (r·3 + c + 11·f)%256
            WITH m AS (SELECT CAST(i AS BIGINT) AS media_id,
                              CAST(16 + (i % 3) * 8 AS BIGINT) AS h,
                              CAST(16 AS BIGINT) AS w,
                              CAST(4 + i % 3 AS BIGINT) AS nf
                       FROM range(0, 64) t(i)),
            f AS (SELECT m.*, CAST(j AS BIGINT) AS frame_index
                  FROM m, range(0, 6) s(j) WHERE j < m.nf)
            SELECT f.media_id, f.frame_index,
                   CAST(f.h * f.w AS BIGINT) AS n_bytes,
                   CAST(SUM((r.r * 3 + c.c + 11 * f.frame_index) % 256)
                        AS BIGINT) AS sum_bytes
            FROM f, range(0, 32) r(r), range(0, 16) c(c)
            WHERE r.r < f.h AND c.c < f.w
            GROUP BY 1, 2, 3""",
        "audio_energy": """
            -- written-artifact recompute: exact integer energy sums
            -- from the engine-written decoded PCM samples
            SELECT media_id,
                   CAST(COUNT(*) AS BIGINT) AS n_samples,
                   CAST(SUM(sample * sample) AS BIGINT) AS sum_sq,
                   CAST(SUM(ABS(sample)) AS BIGINT) AS sum_abs
            FROM read_parquet(
              '/tmp/graft_oracle/sf0.01/audio_samples/*.parquet')
            GROUP BY media_id""",
        "graph_eccentricity": f"""
            -- seeded eccentricity over the identical unrolled BFS
            -- levels the spcount oracle pins: MAX dist, reached count
            -- (self included; unreachable rows carry dist = -1), Σ dist
            SELECT seed,
                   CAST(MAX(dist) AS BIGINT) AS ecc,
                   CAST(SUM(CASE WHEN dist >= 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_reached,
                   CAST(SUM(CASE WHEN dist > 0 THEN dist ELSE 0 END)
                        AS BIGINT) AS sum_dist
            FROM ({_spcount_sql()}) sp
            GROUP BY seed""",
        "graph_harmonic": f"""
            -- quantized harmonic centrality over the spcount seed set:
            -- exact integer floor-div of the same unrolled BFS levels
            WITH sp AS ({_spcount_sql()})
            SELECT vertex,
                   CAST(SUM(CASE WHEN dist > 0
                            THEN 1048576 // dist ELSE 0 END)
                        AS BIGINT) AS harmonic_q
            FROM sp GROUP BY vertex""",
        "graph_kcore": _kcore_sql(),
        "graph_leiden_objective": _leiden_objective_sql(),
        "graph_leiden_conductance": _leiden_conductance_sql(),
        "graph_louvain_objective": _louvain_objective_sql(),
        "partition_rand_index": """
            -- pair-counting Rand-index sums recomputed from the two
            -- written (vertex, community) partitions joined on vertex —
            -- the written-partition external-check pattern
            WITH p1 AS (SELECT vertex, community AS c1 FROM read_parquet(
                   '/tmp/graft_oracle/sf0.01/ri_leiden_comm/*.parquet')),
            p2 AS (SELECT vertex, community AS c2 FROM read_parquet(
                   '/tmp/graft_oracle/sf0.01/ri_louvain_comm/*.parquet')),
            cont AS (SELECT c1, c2, CAST(COUNT(*) AS BIGINT) AS n
                     FROM p1 JOIN p2 USING (vertex) GROUP BY 1, 2),
            ma AS (SELECT c1, CAST(SUM(n) AS BIGINT) AS m
                   FROM cont GROUP BY 1),
            mb AS (SELECT c2, CAST(SUM(n) AS BIGINT) AS m
                   FROM cont GROUP BY 1),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv FROM p1)
            SELECT (SELECT nv FROM nn) AS n_vertices,
                   CAST((SELECT SUM(n * (n - 1)) FROM cont) AS BIGINT)
                     AS s_nij,
                   CAST((SELECT SUM(m * (m - 1)) FROM ma) AS BIGINT)
                     AS s_a,
                   CAST((SELECT SUM(m * (m - 1)) FROM mb) AS BIGINT)
                     AS s_b,
                   CAST((SELECT nv * (nv - 1) FROM nn)
                        - (SELECT SUM(m * (m - 1)) FROM ma)
                        - (SELECT SUM(m * (m - 1)) FROM mb)
                        + 2 * (SELECT SUM(n * (n - 1)) FROM cont)
                        AS BIGINT) AS agree2""",
        # written-artifact recompute oracles (VERDICT r3 item 4): the Ray
        # query writes its approximate result + inputs to parquet and
        # returns exact integers; DuckDB recomputes them from the files
        "minhash_consistency": """
            WITH p AS (SELECT doc_a, doc_b FROM read_parquet(
                   '/tmp/graft_oracle/sf0.01/minhash_pairs/*.parquet')),
            s AS (SELECT doc_id, sig FROM read_parquet(
                   '/tmp/graft_oracle/sf0.01/minhash_sigs/*.parquet'))
            SELECT p.doc_a, p.doc_b,
                   CAST((SELECT COUNT(*) FROM range(1, 65) t(i)
                         WHERE a.sig[CAST(i AS INT)]
                               = b.sig[CAST(i AS INT)]) AS BIGINT)
                     AS matches
            FROM p JOIN s a ON a.doc_id = p.doc_a
                   JOIN s b ON b.doc_id = p.doc_b""",
        "simhash_pairs_consistency": """
            WITH s AS (SELECT doc_id, simhash FROM read_parquet(
                   '/tmp/graft_oracle/sf0.01/simhash_sigs/*.parquet')),
            bands AS (
              SELECT doc_id, simhash, i AS band,
                     (simhash >> CAST(16*i AS BIGINT)) & 65535 AS bucket
              FROM s, range(0, 4) t(i)),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.simhash AS ha, b.simhash AS hb
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.bucket = b.bucket
               AND a.doc_id < b.doc_id)
            SELECT doc_a, doc_b,
                   CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
            FROM cand WHERE bit_count(xor(ha, hb)) <= 3""",
        "embedding_dups_consistency": """
            WITH p AS (SELECT vec_a, vec_b FROM read_parquet(
                   '/tmp/graft_oracle/sf0.01/embedding_dup_pairs/*.parquet'))
            SELECT p.vec_a, p.vec_b
            FROM p JOIN embeddings a ON a.vec_id = p.vec_a
                   JOIN embeddings b ON b.vec_id = p.vec_b
            WHERE list_cosine_similarity(a.embedding, b.embedding)
                  >= 0.45 - 1e-9""",
        "knn_ivf_recall": """
            WITH ivf AS (SELECT query_id, neighbor_id FROM read_parquet(
                   '/tmp/graft_oracle/sf0.01/knn_ivf/*.parquet')),
            q AS (SELECT vec_id, embedding FROM embeddings
                  WHERE vec_id < 10),
            scored AS (
              SELECT q.vec_id, v.vec_id AS neighbor_id,
                     list_cosine_similarity(q.embedding, v.embedding) AS s
              FROM q CROSS JOIN embeddings v),
            ranked AS (
              SELECT vec_id, neighbor_id,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                                        ORDER BY s DESC, neighbor_id ASC)
                       AS rank
              FROM scored),
            exact AS (
              SELECT DENSE_RANK() OVER (ORDER BY vec_id) - 1 AS query_id,
                     neighbor_id
              FROM ranked WHERE rank <= 5)
            SELECT (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT)
                    FROM ivf) AS queries,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM ivf) AS pairs,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM ivf i
                    JOIN exact e ON i.query_id = e.query_id
                     AND i.neighbor_id = e.neighbor_id) AS exact_hits""",
        "graph_assortativity": f"""
            -- exact-integer degree-assortativity sums over the canonical
            -- non-self edge set (stats.py): degree = distinct non-self
            -- neighbors; Pearson r derives from these BIGINTs exactly
            WITH {_CORPUS_CTE},
            vid AS (
              SELECT repo || '|' || path AS key,
                     ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v
              FROM files),
            e AS (
              SELECT va.v AS u, vb.v AS w
              FROM canon c
              JOIN vid va ON va.key = c.key_a
              JOIN vid vb ON vb.key = c.key_b),
            eo AS (
              SELECT LEAST(u, w) AS a, GREATEST(u, w) AS b FROM e
              WHERE u <> w GROUP BY 1, 2),
            sym AS (SELECT a AS u, b AS t FROM eo
                    UNION ALL SELECT b, a FROM eo),
            deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d
                    FROM sym GROUP BY u)
            SELECT CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(da.d * db.d) AS BIGINT) AS s_jk,
                   CAST(SUM(da.d + db.d) AS BIGINT) AS s_sum,
                   CAST(SUM(da.d * da.d + db.d * db.d) AS BIGINT) AS s_sq
            FROM eo
            JOIN deg da ON da.u = eo.a
            JOIN deg db ON db.u = eo.b""",
        "graph_bfs": f"""
            -- multi-source BFS: hop distance to the nearest seed
            -- (v % 97 = 0), -1 if unreachable (bfs.py). The recursion
            -- carries (v, d) pairs with d capped at 64 — UNION dedup
            -- bounds the row set, and the engine asserts its true max
            -- distance is below the cap, so MIN(d) is the exact BFS
            -- distance
            WITH RECURSIVE {_CORPUS_CTE},
            vid AS (
              SELECT repo || '|' || path AS key,
                     ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v
              FROM files),
            e AS (
              SELECT va.v AS u, vb.v AS w
              FROM canon c
              JOIN vid va ON va.key = c.key_a
              JOIN vid vb ON vb.key = c.key_b),
            sym AS (
              SELECT u, w FROM e UNION SELECT w, u FROM e),
            walk(v, d) AS (
              SELECT v, 0 FROM vid WHERE v % 97 = 0
              UNION
              SELECT s.u, r.d + 1 FROM walk r JOIN sym s ON s.w = r.v
              WHERE r.d < 64)
            SELECT vid.v AS vertex, COALESCE(m.d, -1) AS dist
            FROM vid
            LEFT JOIN (SELECT v, MIN(d) AS d FROM walk GROUP BY v) m
              ON m.v = vid.v""",
        "graph_components": f"""
            -- min-label fixpoint: component(v) = min vertex id reachable
            -- from v (the engine's labeling convention, components.py)
            WITH RECURSIVE {_CORPUS_CTE},
            vid AS (
              SELECT repo || '|' || path AS key,
                     ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v
              FROM files),
            e AS (
              SELECT va.v AS u, vb.v AS w
              FROM canon c
              JOIN vid va ON va.key = c.key_a
              JOIN vid vb ON vb.key = c.key_b),
            sym AS (
              SELECT u, w FROM e UNION SELECT w, u FROM e),
            reach(v, lbl) AS (
              SELECT v, v FROM vid
              UNION
              SELECT s.u, r.lbl FROM reach r JOIN sym s ON s.w = r.v)
            SELECT v AS vertex, MIN(lbl) AS component
            FROM reach GROUP BY v""",
        "graph_tri_support": f"""
            -- per-edge triangle support: number of triangles containing
            -- each canonical non-self edge (trisupport.py); 0 for edges
            -- in no triangle. tri enumerates each triangle once with
            -- x < y < z, so its three edges are already canonical
            WITH {_CORPUS_CTE},
            vid AS (
              SELECT repo || '|' || path AS key,
                     ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v
              FROM files),
            e AS (
              SELECT va.v AS u, vb.v AS w
              FROM canon c
              JOIN vid va ON va.key = c.key_a
              JOIN vid vb ON vb.key = c.key_b),
            eo AS (
              SELECT LEAST(u, w) AS a, GREATEST(u, w) AS b FROM e
              WHERE u <> w GROUP BY 1, 2),
            tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM eo e1
              JOIN eo e2 ON e2.a = e1.b
              JOIN eo e3 ON e3.a = e1.a AND e3.b = e2.b),
            edge_tri AS (
              SELECT x AS a, y AS b FROM tri
              UNION ALL SELECT x, z FROM tri
              UNION ALL SELECT y, z FROM tri)
            SELECT eo.a AS src, eo.b AS dst,
                   CAST(COALESCE(s.n, 0) AS BIGINT) AS support
            FROM eo
            LEFT JOIN (SELECT a, b, COUNT(*) AS n FROM edge_tri
                       GROUP BY a, b) s
              ON s.a = eo.a AND s.b = eo.b""",
        "graph_clustering": f"""
            -- per-vertex local clustering coefficient: tri(v) triangles
            -- at v, degree(v) distinct neighbors (degree-0 vertices have
            -- no edge row and are excluded), coeff = 2*tri/(deg*(deg-1))
            -- with the deg<2 -> 0.0 convention (corpus_queries.py
            -- ::graph_clustering)
            WITH {_CORPUS_CTE},
            vid AS (
              SELECT repo || '|' || path AS key,
                     ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v
              FROM files),
            e AS (
              SELECT va.v AS u, vb.v AS w
              FROM canon c
              JOIN vid va ON va.key = c.key_a
              JOIN vid vb ON vb.key = c.key_b),
            eo AS (
              SELECT LEAST(u, w) AS a, GREATEST(u, w) AS b FROM e
              WHERE u <> w GROUP BY 1, 2),
            tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM eo e1
              JOIN eo e2 ON e2.a = e1.b
              JOIN eo e3 ON e3.a = e1.a AND e3.b = e2.b),
            vt AS (
              SELECT v, COUNT(*) AS n FROM (
                SELECT x AS v FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri) GROUP BY v),
            vd AS (
              SELECT v, COUNT(*) AS deg FROM (
                SELECT a AS v FROM eo
                UNION ALL SELECT b FROM eo) GROUP BY v)
            SELECT vd.v AS vertex,
                   CAST(COALESCE(vt.n, 0) AS BIGINT) AS tri,
                   CAST(vd.deg AS BIGINT) AS degree,
                   CASE WHEN vd.deg > 1 THEN
                     ROUND(CAST(2 * COALESCE(vt.n, 0) AS DOUBLE)
                           / CAST(vd.deg * (vd.deg - 1) AS DOUBLE), 6)
                   ELSE 0.0 END AS coeff
            FROM vd LEFT JOIN vt ON vt.v = vd.v""",
        "graph_adamic_adar": f"""
            -- Adamic–Adar per canonical edge, exact-integer quantized:
            -- each common neighbor w contributes
            -- q = CAST(ROUND(1e9 / LN(deg(w))) AS BIGINT), summed as
            -- BIGINT (order-independent), aa = aa_int / 1e9 as the
            -- UNROUNDED IEEE quotient — bit-identical to the engine's
            -- (algorithms/linkpred.py). Each tri row (x<y<z) credits
            -- edge (x,y) with q(deg(z)), (x,z) with q(deg(y)),
            -- (y,z) with q(deg(x)).
            WITH {_CORPUS_CTE},
            vid AS (
              SELECT repo || '|' || path AS key,
                     ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v
              FROM files),
            e AS (
              SELECT va.v AS u, vb.v AS w
              FROM canon c
              JOIN vid va ON va.key = c.key_a
              JOIN vid vb ON vb.key = c.key_b),
            eo AS (
              SELECT LEAST(u, w) AS a, GREATEST(u, w) AS b FROM e
              WHERE u <> w GROUP BY 1, 2),
            tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM eo e1
              JOIN eo e2 ON e2.a = e1.b
              JOIN eo e3 ON e3.a = e1.a AND e3.b = e2.b),
            vd AS (
              SELECT v, COUNT(*) AS deg FROM (
                SELECT a AS v FROM eo
                UNION ALL SELECT b FROM eo) GROUP BY v),
            q AS (
              SELECT v, CAST(ROUND(1000000000.0 / LN(deg)) AS BIGINT)
                     AS q
              FROM vd WHERE deg >= 2),
            cred AS (
              SELECT x AS a, y AS b, z AS w FROM tri
              UNION ALL SELECT x, z, y FROM tri
              UNION ALL SELECT y, z, x FROM tri),
            sumq AS (
              SELECT c.a, c.b, SUM(q.q) AS s
              FROM cred c JOIN q ON q.v = c.w GROUP BY c.a, c.b)
            SELECT eo.a AS src, eo.b AS dst,
                   CAST(COALESCE(s.s, 0) AS BIGINT) AS aa_int,
                   CAST(COALESCE(s.s, 0) AS DOUBLE) / 1000000000.0
                     AS aa
            FROM eo LEFT JOIN sumq s ON s.a = eo.a AND s.b = eo.b""",
        "graph_jaccard": f"""
            -- per-edge neighborhood Jaccard: inter = |N(u) ∩ N(v)| (the
            -- edge's triangle support), uni = deg(u)+deg(v)-inter with
            -- raw neighbor sets (v ∈ N(u), so uni >= 2)
            -- (corpus_queries.py::graph_jaccard_edges)
            WITH {_CORPUS_CTE},
            vid AS (
              SELECT repo || '|' || path AS key,
                     ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v
              FROM files),
            e AS (
              SELECT va.v AS u, vb.v AS w
              FROM canon c
              JOIN vid va ON va.key = c.key_a
              JOIN vid vb ON vb.key = c.key_b),
            eo AS (
              SELECT LEAST(u, w) AS a, GREATEST(u, w) AS b FROM e
              WHERE u <> w GROUP BY 1, 2),
            tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM eo e1
              JOIN eo e2 ON e2.a = e1.b
              JOIN eo e3 ON e3.a = e1.a AND e3.b = e2.b),
            edge_tri AS (
              SELECT x AS a, y AS b FROM tri
              UNION ALL SELECT x, z FROM tri
              UNION ALL SELECT y, z FROM tri),
            sup AS (SELECT a, b, COUNT(*) AS n FROM edge_tri GROUP BY a, b),
            vd AS (
              SELECT v, COUNT(*) AS deg FROM (
                SELECT a AS v FROM eo
                UNION ALL SELECT b FROM eo) GROUP BY v)
            SELECT eo.a AS src, eo.b AS dst,
                   CAST(COALESCE(s.n, 0) AS BIGINT) AS inter,
                   CAST(da.deg + db.deg - COALESCE(s.n, 0) AS BIGINT)
                     AS uni,
                   ROUND(CAST(COALESCE(s.n, 0) AS DOUBLE)
                         / CAST(da.deg + db.deg - COALESCE(s.n, 0)
                                AS DOUBLE), 6) AS jaccard
            FROM eo
            JOIN vd da ON da.v = eo.a
            JOIN vd db ON db.v = eo.b
            LEFT JOIN sup s ON s.a = eo.a AND s.b = eo.b""",
        "graph_triangles": f"""
            WITH {_CORPUS_CTE},
            vid AS (
              SELECT repo || '|' || path AS key,
                     ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v
              FROM files),
            e AS (
              SELECT va.v AS u, vb.v AS w
              FROM canon c
              JOIN vid va ON va.key = c.key_a
              JOIN vid vb ON vb.key = c.key_b),
            eo AS (  -- oriented low id -> high id, both input orders folded
              SELECT LEAST(u, w) AS a, GREATEST(u, w) AS b FROM e
              WHERE u <> w GROUP BY 1, 2),
            tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM eo e1
              JOIN eo e2 ON e2.a = e1.b
              JOIN eo e3 ON e3.a = e1.a AND e3.b = e2.b),
            contrib AS (
              SELECT x AS v FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri)
            SELECT vid.v AS vertex,
                   COALESCE(t.n, 0) AS triangles
            FROM vid
            LEFT JOIN (SELECT v, COUNT(*) AS n FROM contrib GROUP BY v) t
              ON t.v = vid.v""",
        "graph_clustering_coef": f"""
            -- local clustering coefficient = 2T / (deg(deg-1)) over the
            -- simple graph, deg<2 -> 0.0 (engine convention, pinned);
            -- the DOUBLE is the identical single IEEE division
            WITH {_CORPUS_CTE},
            vid AS (
              SELECT repo || '|' || path AS key,
                     ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS v
              FROM files),
            e AS (
              SELECT va.v AS u, vb.v AS w
              FROM canon c
              JOIN vid va ON va.key = c.key_a
              JOIN vid vb ON vb.key = c.key_b),
            eo AS (
              SELECT LEAST(u, w) AS a, GREATEST(u, w) AS b FROM e
              WHERE u <> w GROUP BY 1, 2),
            tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM eo e1
              JOIN eo e2 ON e2.a = e1.b
              JOIN eo e3 ON e3.a = e1.a AND e3.b = e2.b),
            contrib AS (
              SELECT x AS v FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri),
            vd AS (
              SELECT v, COUNT(*) AS deg FROM (
                SELECT a AS v FROM eo
                UNION ALL SELECT b FROM eo) GROUP BY v)
            SELECT vid.v AS vertex,
                   CAST(COALESCE(t.n, 0) AS BIGINT) AS triangles,
                   CAST(COALESCE(vd.deg, 0) AS BIGINT) AS deg,
                   CASE WHEN COALESCE(vd.deg, 0) >= 2
                        THEN CAST(2 * COALESCE(t.n, 0) AS DOUBLE)
                             / CAST(vd.deg * (vd.deg - 1) AS DOUBLE)
                        ELSE 0.0 END AS clustering_coef
            FROM vid
            LEFT JOIN (SELECT v, COUNT(*) AS n FROM contrib GROUP BY v) t
              ON t.v = vid.v
            LEFT JOIN vd ON vd.v = vid.v""",
    }
