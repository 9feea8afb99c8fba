"""AOT-compile the train step at a given batch/remat mode and print the FULL
error (bench_train truncates to 120 chars — which is how the round-2 "AOT
helper failure" hid a plain XLA OOM; see PERF.md).

Usage: python tools/probe_train_compile.py BATCH [REMAT_MODE|off]
"""

import sys
import types

import numpy as np

import _init_paths  # noqa: F401

from buctd_tpu.utils.compcache import enable as _enable_compcache

_enable_compcache()


def main():
    import jax
    import jax.numpy as jnp

    from buctd_tpu.config import default_config, update_config
    from buctd_tpu.models import get_model
    from buctd_tpu.ops import generate_target
    from buctd_tpu.train.state import create_train_state, make_train_step

    B = int(sys.argv[1])
    mode = sys.argv[2] if len(sys.argv) > 2 else "stem"
    opts = [] if mode == "off" else ["TPU.REMAT", "True",
                                     "TPU.REMAT_MODE", mode]
    cfg = default_config()
    update_config(cfg, types.SimpleNamespace(
        cfg="/root/repo/experiments/coco/buctd/prenet_w48_384x288.yaml",
        opts=opts, modelDir="", logDir="", dataDir=""))
    model = get_model(cfg, is_train=True, dtype=jnp.bfloat16)
    J = int(cfg.MODEL.NUM_JOINTS)

    rng = np.random.RandomState(0)
    joints = rng.rand(B, J, 2).astype(np.float32) * [280, 370] + 4
    tgt, _ = generate_target(jnp.array(joints), jnp.ones((B, J)),
                             (288, 384), (72, 96), 3)
    batch = {
        "input": jnp.zeros((B, 384, 288, 6), jnp.float32),
        "target": jnp.array(np.asarray(tgt).transpose(0, 2, 3, 1)),
        "target_weight": jnp.ones((B, J), jnp.float32),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 384, 288, 6)),
                               steps_per_epoch=1000)
    step = make_train_step(cfg, model)
    try:
        c = step.lower(state, batch, jax.random.PRNGKey(1)).compile()
        mem = c.memory_analysis()
        print(f"b{B} {mode}: COMPILES.  memory_analysis: {mem}")
    except Exception as e:
        print(f"b{B} {mode}: FAILED {type(e).__name__}; full message follows\n")
        print(str(e)[-8000:])


if __name__ == "__main__":
    main()
