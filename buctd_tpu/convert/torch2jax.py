"""PyTorch checkpoint -> flax variables converter.

Our flax module names mirror the reference's torch dotted paths (wrapper levels are
prefixed with "_" and dropped when joining), so one generic converter covers every
architecture (HRNet / CoAM / TransPose / ResNet):

    flax  ["_trunk"]["stage2.0"]["branches.0.1"]["conv1"]["kernel"]
    torch "stage2.0.branches.0.1.conv1.weight"

Leaf mapping: conv kernel HWIO <- torch OIHW; linear kernel (in,out) <- torch (out,in);
BN scale/bias <- weight/bias; batch_stats mean/var <- running_mean/running_var.
Needed for the <=0.3 AP parity target (BASELINE.md) without retraining.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


_LEAF_TO_TORCH = {
    ("params", "kernel"): "weight",
    ("params", "scale"): "weight",
    ("params", "bias"): "bias",
    ("batch_stats", "mean"): "running_mean",
    ("batch_stats", "var"): "running_var",
}


def _torch_key(collection: str, path) -> str:
    parts = [p.key for p in path]
    leaf = parts.pop()
    torch_leaf = _LEAF_TO_TORCH[(collection, leaf)]
    joined = [p for p in parts if not p.startswith("_")]
    return ".".join(joined + [torch_leaf])


def _convert_tensor(torch_arr: np.ndarray, flax_template: jnp.ndarray) -> np.ndarray:
    arr = np.asarray(torch_arr)
    if arr.ndim == 4 and flax_template.ndim == 4:  # conv OIHW -> HWIO
        arr = arr.transpose(2, 3, 1, 0)
    elif arr.ndim == 2 and flax_template.ndim == 2:
        arr = arr.T  # linear (out,in) -> (in,out); unconditional — square weights too
    if arr.shape != flax_template.shape:
        raise ValueError(
            f"shape mismatch: torch {arr.shape} vs flax {flax_template.shape}")
    return arr.astype(np.asarray(flax_template).dtype)


def torch_to_flax(state_dict: dict, flax_variables: dict, strict: bool = True,
                  key_map=None, ignore=()) -> dict:
    """Fill a flax variable tree from a torch state_dict.

    Args:
      state_dict: name -> numpy array (or torch tensors; .numpy() is attempted).
      flax_variables: template from model.init (gives structure/shapes/dtypes).
      strict: error on missing torch keys (otherwise keep the template value).
      key_map: optional callable rewriting the derived torch key (for models whose
        torch names don't line up 1:1, e.g. packed attention weights).

    Returns a new variable dict; also reports unused torch keys when strict.
    """
    sd = {}
    for k, v in state_dict.items():
        if k.endswith("num_batches_tracked") or k in ignore:
            continue
        sd[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    used = set()
    out = {}
    for collection in flax_variables:
        flat = jax.tree_util.tree_flatten_with_path(flax_variables[collection])
        new_leaves = []
        for path, template in flat[0]:
            tkey = _torch_key(collection, path)
            if key_map is not None:
                tkey = key_map(tkey)
            if tkey in sd:
                new_leaves.append(jnp.asarray(_convert_tensor(sd[tkey], template)))
                used.add(tkey)
            elif strict:
                raise KeyError(f"torch checkpoint missing {tkey!r} "
                               f"(flax path {jax.tree_util.keystr(path)})")
            else:
                new_leaves.append(template)
        out[collection] = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(flax_variables[collection]), new_leaves)

    if strict:
        unused = set(sd) - used
        if unused:
            raise KeyError(f"{len(unused)} torch keys unused, e.g. {sorted(unused)[:5]}")
    return out


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pth file; prefers 'latest_state_dict' like tools/test.py:120-125,
    falling back to 'best_state_dict'/'state_dict' or the raw dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("latest_state_dict", "best_state_dict", "state_dict"):
            if key in ckpt:
                ckpt = ckpt[key]
                break
    # strip DataParallel 'module.' prefixes
    return {k[7:] if k.startswith("module.") else k: v for k, v in ckpt.items()}


def load_pretrained_subset(flax_variables: dict, state_dict: dict,
                           pretrained_layers=("*",), key_map=None) -> dict:
    """ImageNet warm start: fill only the layers listed in PRETRAINED_LAYERS.

    Matches the reference's init_weights subset loading (pose_hrnet.py:596-605):
    a torch key is loaded when its first dotted component is in pretrained_layers
    (or the list is ['*']); everything else keeps its fresh initialization.
    Missing/mismatched keys are skipped silently, like the reference's
    need_init_state_dict filtering.
    """
    allowed = set(pretrained_layers)
    wildcard = "*" in allowed

    def subset_map(tkey):
        if key_map is not None:
            tkey = key_map(tkey)
        return tkey

    sd = {}
    for k, v in state_dict.items():
        if k.endswith("num_batches_tracked"):
            continue
        if not (wildcard or k.split(".")[0] in allowed):
            continue
        sd[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    out = {}
    for collection in flax_variables:
        flat = jax.tree_util.tree_flatten_with_path(flax_variables[collection])
        new_leaves = []
        for path, template in flat[0]:
            tkey = subset_map(_torch_key(collection, path))
            if tkey in sd:
                try:
                    new_leaves.append(jnp.asarray(_convert_tensor(sd[tkey], template)))
                    continue
                except ValueError:
                    pass  # shape mismatch (e.g. imagenet head) -> keep fresh init
            new_leaves.append(template)
        out[collection] = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(flax_variables[collection]), new_leaves)
    return out
