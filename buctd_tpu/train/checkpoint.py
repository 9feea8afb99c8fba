"""Checkpointing with orbax: save/auto-resume/best, replacing the reference's
torch.save dict flow (lib/utils/utils.py:303-308, tools/train.py:243-266)."""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def _host(x) -> np.ndarray:
    """Fetch an array to host numpy.  Multi-host, the train state is replicated
    (parallel/mesh.py replicate) so the array spans non-addressable devices and
    plain np.asarray raises; any local shard holds the full value."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return np.asarray(x.addressable_shards[0].data)
    return np.asarray(x)


def _to_saveable(state) -> dict:
    return {
        "step": _host(state.step),
        "params": jax.tree.map(_host, state.params),
        "batch_stats": jax.tree.map(_host, state.batch_stats),
        "opt_state": jax.tree.map(_host, state.opt_state),
    }


# one shared checkpointer so successive async saves serialize correctly
_CKPTR = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def wait_for_saves():
    """Block until all in-flight async checkpoint saves land."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_checkpoint(state, output_dir: str, name: str = "checkpoint",
                    is_best: bool = False, perf: float | None = None,
                    block: bool = True) -> str:
    """Save the train state.  ``block=False`` overlaps the (slow, ~40 s on this
    filesystem) orbax write with the next epoch's compute: the payload is
    host-materialized up front, the previous save is awaited, and the new one runs
    in orbax's background thread.  Call ``wait_for_saves()`` (or a final blocking
    save) before exiting.

    Multi-host: EVERY process must call this (orbax's save/finalize run
    ``sync_global_processes`` barriers that all hosts join — gating the call to
    process 0 deadlocks it); orbax itself writes the replicated payload from the
    primary host only, so the shared-filesystem path sees exactly one writer
    (the reference is single-process, lib/utils/utils.py:303-308 — there is
    nothing per-host to persist)."""
    path = os.path.abspath(os.path.join(output_dir, name))
    ckptr = _checkpointer()
    payload = _to_saveable(state)
    payload["perf"] = np.float64(perf if perf is not None else 0.0)
    ckptr.wait_until_finished()  # serialize with any previous async save
    ckptr.save(path, payload, force=True)
    if is_best:
        ckptr.wait_until_finished()
        best = os.path.abspath(os.path.join(output_dir, "model_best"))
        ckptr.save(best, payload, force=True)
    if block:
        ckptr.wait_until_finished()
    return path


def restore_checkpoint(state, output_dir: str, name: str = "checkpoint"):
    """Restore into an existing TrainState template; returns (state, found)."""
    wait_for_saves()  # don't read a checkpoint that is still being written
    path = os.path.abspath(os.path.join(output_dir, name))
    if not os.path.exists(path):
        return state, False
    ckptr = _checkpointer()
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
