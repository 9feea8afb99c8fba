from .torch2jax import torch_to_flax, load_torch_checkpoint

__all__ = ["torch_to_flax", "load_torch_checkpoint"]
