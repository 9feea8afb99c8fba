"""Axon-relay health probe.

The axon PJRT client blocks FOREVER inside backend initialization when the
relay tunnel daemon is down (observed mid-round: the tunnel died and every
`jax.devices()` call hung).  Driver-facing entry points (bench.py,
__graft_entry__.py) probe the tunnel's TCP ports BEFORE the first jax backend
touch and force the CPU platform when it is unreachable, so they degrade to a
labeled CPU run instead of hanging the driver.

Port list from /root/.tpu_init.py (the relay listens on a spread of local
ports; any one accepting connections means the daemon is alive).
"""

import os
import socket

_RELAY_PORTS = (8082, 8093, 8103, 8113)


def relay_alive(timeout: float = 2.0) -> bool:
    """True if any axon relay tunnel port accepts a TCP connection."""
    for port in _RELAY_PORTS:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=timeout):
                return True
        except OSError:
            continue
    return False


def ensure_live_backend(verbose: bool = True) -> bool:
    """Force the CPU platform if the relay is down (or BUCTD_FORCE_CPU=1).

    Must run before any jax backend initialization (this host's sitecustomize
    forces jax_platforms=axon,cpu and IGNORES the JAX_PLATFORMS env var, so
    jax.config.update is the only effective switch).  Returns True if the
    TPU path is available, False if we fell back to CPU.
    """
    if os.environ.get("BUCTD_FORCE_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
        return False
    if not relay_alive():
        import sys

        import jax

        if verbose:
            print("# axon relay unreachable -> CPU fallback", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        return False
    return True
