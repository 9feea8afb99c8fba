"""Make buctd_tpu importable when tools/ scripts run from anywhere
(reference: tools/_init_paths.py adds ../lib; here the package lives at repo root)."""

import os
import os.path as osp
import sys


def add_path(path):
    if path not in sys.path:
        sys.path.insert(0, path)


this_dir = osp.dirname(__file__)
add_path(osp.join(this_dir, ".."))

if os.environ.get("BUCTD_FORCE_CPU"):
    # the sitecustomize on this machine overrides JAX_PLATFORMS at interpreter start,
    # so tests force CPU through jax.config instead (see tests/conftest.py)
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    # dead-relay guard: the axon PJRT client hangs forever in backend init when
    # the tunnel daemon is down.  A CLI should fail fast with a clear message,
    # not silently train on CPU — set BUCTD_FORCE_CPU=1 to run on CPU on purpose.
    from buctd_tpu.utils.relay import relay_alive

    if not relay_alive():
        raise SystemExit(
            "buctd_tpu: axon relay tunnel unreachable (TPU backend init would "
            "hang). Set BUCTD_FORCE_CPU=1 to run on CPU instead.")

from buctd_tpu.utils.compcache import enable as _enable_compcache  # noqa: E402

_enable_compcache()
