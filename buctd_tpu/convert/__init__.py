from .torch2jax import torch_to_flax, load_torch_checkpoint, load_pretrained_subset

__all__ = ["torch_to_flax", "load_torch_checkpoint", "load_pretrained_subset"]
