from leiden_cuda_ray.state.checkpoint import Checkpointer

__all__ = ["Checkpointer"]
