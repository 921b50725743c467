from leiden_cuda_ray.functions import dedup, multimodal, similarity, text

__all__ = ["dedup", "similarity", "text", "multimodal"]
