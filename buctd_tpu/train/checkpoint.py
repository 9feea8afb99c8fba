"""Checkpointing with orbax: save/auto-resume/best, replacing the reference's
torch.save dict flow (lib/utils/utils.py:303-308, tools/train.py:243-266)."""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_saveable(state) -> dict:
    return {
        "step": np.asarray(state.step),
        "params": jax.tree.map(np.asarray, state.params),
        "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
    }


def save_checkpoint(state, output_dir: str, name: str = "checkpoint",
                    is_best: bool = False, perf: float | None = None) -> str:
    path = os.path.abspath(os.path.join(output_dir, name))
    ckptr = ocp.StandardCheckpointer()
    payload = _to_saveable(state)
    payload["perf"] = np.float64(perf if perf is not None else 0.0)
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if is_best:
        best = os.path.abspath(os.path.join(output_dir, "model_best"))
        ckptr.save(best, payload, force=True)
        ckptr.wait_until_finished()
    return path


def restore_checkpoint(state, output_dir: str, name: str = "checkpoint"):
    """Restore into an existing TrainState template; returns (state, found)."""
    path = os.path.abspath(os.path.join(output_dir, name))
    if not os.path.exists(path):
        return state, False
    ckptr = ocp.StandardCheckpointer()
    template = _to_saveable(state)
    template["perf"] = np.float64(0.0)
    restored = ckptr.restore(path, target=template)
    new_state = state.replace(
        step=jax.numpy.asarray(restored["step"]),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    return new_state, True


def save_params(variables: dict, path: str) -> None:
    """Save bare inference variables (params + batch_stats)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path),
               jax.tree.map(np.asarray, variables), force=True)
    ckptr.wait_until_finished()


def load_params(path: str, template: dict | None = None) -> dict:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=template)
