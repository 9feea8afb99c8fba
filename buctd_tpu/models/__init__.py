"""Model registry.

The reference resolves architectures via string eval (tools/train.py:92); here it's an
explicit registry keyed by the same MODEL.NAME values.
"""

from . import hrnet, hrnet_coam, resnet, transpose
from .transpose import transpose_key_map

_REGISTRY = {
    "pose_hrnet": hrnet.get_pose_net,
    "pose_hrnet_coam": hrnet_coam.get_pose_net,
    "transpose_h": transpose.get_pose_net,
    "pose_resnet": resnet.get_pose_net,
}

# per-model torch-key rewrites for the checkpoint converter
KEY_MAPS = {"transpose_h": transpose_key_map}
# torch state_dict entries with no flax counterpart (computed at runtime instead)
IGNORE_TORCH_KEYS = {"transpose_h": ("pos_embedding",)}


# what get_model last wrote to the engine env var — so a LATER get_model with a
# different cfg can overwrite our own export, while an externally-set env var
# (user/test override) is never clobbered
_ENGINE_EXPORTED: list = []


def get_model(cfg, is_train: bool = False, dtype=None):
    name = cfg.MODEL.NAME
    if name not in _REGISTRY:
        raise KeyError(f"unknown MODEL.NAME {name!r}; known: {sorted(_REGISTRY)}")
    # export the attention-engine knob for the flax modules (they have no cfg);
    # read at trace time in models/attention.py::_use_flash
    import os

    eng = str(getattr(cfg.TPU, "ATTENTION_ENGINE", "auto"))
    cur = os.environ.get("BUCTD_ATTENTION_ENGINE")
    if cur is None or cur == "auto" or (_ENGINE_EXPORTED
                                        and cur == _ENGINE_EXPORTED[-1]):
        os.environ["BUCTD_ATTENTION_ENGINE"] = eng
        _ENGINE_EXPORTED[:] = [eng]
    return _REGISTRY[name](cfg, is_train=is_train, dtype=dtype)


def compute_dtype(cfg, key: str = "COMPUTE_DTYPE"):
    """cfg.TPU.<key> -> flax compute dtype (None == float32).

    The tools pass this to get_model; library/test callers that need strict f32
    numerics simply omit it.  tools/test.py uses key='EVAL_DTYPE' (f32 default):
    bf16 heatmaps can flip argmaxes near ties, which costs AP parity."""
    import jax.numpy as jnp

    name = str(getattr(cfg.TPU, key, "float32")).lower()
    return {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
            "float32": None, "f32": None}[name]


def converter_options(name: str) -> dict:
    return {
        "key_map": KEY_MAPS.get(name),
        "ignore": IGNORE_TORCH_KEYS.get(name, ()),
    }


__all__ = ["get_model", "converter_options", "KEY_MAPS", "IGNORE_TORCH_KEYS"]
