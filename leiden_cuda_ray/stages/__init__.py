from leiden_cuda_ray.stages.hashing import with_sha256
from leiden_cuda_ray.stages.imports import extract_imports, file_table, resolve_imports
from leiden_cuda_ray.stages.cocommit import cocommit_vid_edges
from leiden_cuda_ray.stages.edges import (
    canonicalize_edges,
    symmetrize,
    dedup_min_weight,
)
from leiden_cuda_ray.stages.numbering import build_vertex_numbering, zip_with_index

__all__ = [
    "with_sha256",
    "extract_imports",
    "resolve_imports",
    "file_table",
    "cocommit_vid_edges",
    "canonicalize_edges",
    "symmetrize",
    "dedup_min_weight",
    "build_vertex_numbering",
    "zip_with_index",
]
