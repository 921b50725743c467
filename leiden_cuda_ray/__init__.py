"""leiden_cuda_ray — a Ray-Data-native link-graph analytics engine.

Built from scratch with the query/data-processing capabilities of the
reference `knagaitsev/leiden-cuda` project (see SURVEY.md), re-expressed
Ray-Data-first:

- sources/   : parquet corpus reader + deterministic synthetic generator,
               text edge-list parser (reference loader semantics:
               csrc/test/main.cpp:117-177)
- stages/    : stateless map_batches stages (sha256, import extraction,
               co-commit pairing, edge canonicalization, vertex numbering)
- graph/     : partitioned CSR runtime over Arrow blocks + gather-scatter
               superstep machinery (object-store resident, push-model)
- algorithms/: pagerank, connected components, label propagation,
               triangle counting, louvain, leiden
- state/     : per-superstep checkpoint manifests + resume
- functions/ : dedup (exact/minhash/simhash/jaccard/embedding), similarity
               search, text analysis, multimodal stubs
- pipelines/ : end-to-end flagship + relational demo pipelines

NOTE: nothing in this package calls ray.init()/ray.shutdown(); sessions
are owned by bench.py / tests / the driver.
"""

__version__ = "0.1.0"
