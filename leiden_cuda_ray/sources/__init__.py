from leiden_cuda_ray.sources.corpus import corpus_params_for_sf, gen_corpus, read_corpus
from leiden_cuda_ray.sources.edge_list import parse_edge_list_text, read_edge_list
from leiden_cuda_ray.sources.fixtures import (
    clique_ring_edges,
    clique_ring_weighted_edges,
    weighted_triangle_edges,
)

__all__ = [
    "gen_corpus",
    "read_corpus",
    "corpus_params_for_sf",
    "read_edge_list",
    "parse_edge_list_text",
    "clique_ring_edges",
    "clique_ring_weighted_edges",
    "weighted_triangle_edges",
]
