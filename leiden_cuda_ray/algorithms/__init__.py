from leiden_cuda_ray.algorithms.pagerank import pagerank
from leiden_cuda_ray.algorithms.components import connected_components
from leiden_cuda_ray.algorithms.labelprop import label_propagation
from leiden_cuda_ray.algorithms.triangles import triangle_counts
from leiden_cuda_ray.algorithms.louvain import louvain
from leiden_cuda_ray.algorithms.leiden import leiden

__all__ = [
    "pagerank",
    "connected_components",
    "label_propagation",
    "triangle_counts",
    "louvain",
    "leiden",
]
