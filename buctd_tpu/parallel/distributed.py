"""Multi-host (pod-slice) initialization.

The reference is single-node DataParallel only (SURVEY.md §2.8).  Here multi-host is
the same data-parallel mesh code path: ``jax.distributed.initialize`` connects the
hosts over DCN, ``jax.devices()`` then spans the whole slice, and ``make_mesh``
lays the global batch over ICI+DCN.  The loaders shard the per-epoch sample order
per process (``data.pipeline.shard_epoch_order``, same contiguous-ceil convention
as ``process_shard``) so each host reads only its slice of the db, and
``core.function.validate`` all-gathers the per-process prediction blocks before
dataset.evaluate (``parallel.mesh.allgather_rows`` is the generic form).
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger(__name__)


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Initialize multi-host JAX when launched on a pod slice.

    No-ops (returns False) in single-process runs: on Cloud TPU the arguments are
    auto-detected from the metadata server, elsewhere from the JAX_* env vars.
    """
    # NB: must not touch the backend (jax.devices/process_count) before
    # jax.distributed.initialize — that would pin a single-process runtime
    if jax.distributed.is_initialized():
        return True
    env_says_multi = (coordinator_address
                      or os.environ.get("JAX_COORDINATOR_ADDRESS")
                      or os.environ.get("COORDINATOR_ADDRESS"))
    if not env_says_multi and num_processes is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    logger.info("=> jax.distributed initialized: process %d/%d, %d local / %d "
                "global devices", jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())
    return True


def is_primary() -> bool:
    """True on process 0 (or in any single-process run).

    Multi-host persistence gate: the log FileHandler and MetricWriter files
    open on the primary host only — the reference is single-process
    (lib/utils/utils.py:303-308) so N hosts racing the same output paths has
    no reference semantics to preserve.  NOT gated here: checkpoint saves
    (every host must join orbax's internal barriers; orbax itself writes from
    the primary only — train/checkpoint.py), debug-image dumps and eval
    results (every host writes its own per-process-tagged path).
    """
    return jax.process_index() == 0


def process_shard(n: int) -> slice:
    """This host's contiguous shard of a length-n sample index space."""
    p, k = jax.process_index(), jax.process_count()
    per = -(-n // k)
    return slice(p * per, min((p + 1) * per, n))
