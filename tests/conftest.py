"""Test config: run on CPU with a virtual 8-device mesh so sharding tests work
anywhere (SURVEY.md §4).

NB: this machine's sitecustomize registers the 'axon' TPU backend and calls
jax.config.update("jax_platforms", "axon,cpu") at interpreter start, which overrides the
JAX_PLATFORMS env var — so we must override back via jax.config, not the env.  Numeric
parity tests need CPU: TPU convs default to bf16 MXU precision (~1e-3 noise).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
