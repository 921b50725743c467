from leiden_cuda_ray.graph.build import (
    Graph,
    build_graph_from_arrays,
    build_graph_from_dataset,
)

__all__ = ["Graph", "build_graph_from_arrays", "build_graph_from_dataset"]
