from leiden_cuda_ray.pipelines.derive import derive_edges
