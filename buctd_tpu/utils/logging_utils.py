"""Logger / metric-writer / seeding (reference: lib/utils/utils.py:84,220-255).

Output layout matches the reference: {OUTPUT_DIR}/{dataset}/{model}/{cfg_name}/ with a
timestamped log file, plus a tensorboard dir {LOG_DIR}/{dataset}/{model}/{cfg_name}_..
Metrics also stream to metrics.jsonl (always available; tensorboardX optional).
"""

from __future__ import annotations

import json
import logging
import os
import time
from pathlib import Path


def _is_primary() -> bool:
    """Process-0 test that works before/without jax.distributed (single host)."""
    try:
        from ..parallel import is_primary
        return is_primary()
    except Exception:
        return True


def create_logger(cfg, cfg_name: str, phase: str = "train"):
    root_output_dir = Path(cfg.OUTPUT_DIR or "output")
    root_output_dir.mkdir(parents=True, exist_ok=True)

    dataset = cfg.DATASET.DATASET
    model = cfg.MODEL.NAME
    cfg_name = os.path.basename(cfg_name).split(".")[0]

    final_output_dir = root_output_dir / dataset / model / cfg_name
    final_output_dir.mkdir(parents=True, exist_ok=True)

    time_str = time.strftime("%Y-%m-%d-%H-%M")
    log_file = f"{cfg_name}_{time_str}_{phase}.log"
    # explicit handlers: absl (pulled in by jax/orbax) configures the root logger
    # first, which makes logging.basicConfig(filename=...) a silent no-op
    logger = logging.getLogger()
    logger.setLevel(logging.INFO)
    if _is_primary():
        # multi-host: only process 0 owns the log file — N FileHandlers on one
        # shared path interleave corruptly and serve no purpose (the reference
        # is single-process, lib/utils/utils.py:220-255)
        fh = logging.FileHandler(str(final_output_dir / log_file))
        fh.setFormatter(logging.Formatter("%(asctime)-15s %(message)s"))
        logger.addHandler(fh)
        logger.addHandler(logging.StreamHandler())
    else:
        import jax
        sh = logging.StreamHandler()
        # non-primary hosts: console only, rank-tagged, warnings and errors
        sh.setFormatter(logging.Formatter(
            f"[proc {jax.process_index()}] %(asctime)-15s %(message)s"))
        sh.setLevel(logging.WARNING)
        logger.addHandler(sh)

    tb_log_dir = (Path(cfg.LOG_DIR or "log") / dataset / model
                  / f"{cfg_name}_{time_str}")
    tb_log_dir.mkdir(parents=True, exist_ok=True)
    return logger, str(final_output_dir), str(tb_log_dir)


class MetricWriter:
    """Scalar metrics -> metrics.jsonl (+ tensorboardX if importable)."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self._steps: dict = {}
        # multi-host: metric values are identical on every host (losses/AP come
        # out of global collectives) — only process 0 writes them
        self._f = (open(os.path.join(log_dir, "metrics.jsonl"), "a")
                   if _is_primary() else None)
        self._tb = None
        if self._f is not None:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value, step: int | None = None):
        if step is None:  # auto-increment per tag, like the reference's
            step = self._steps.get(tag, 0)  # writer_dict global_steps counters
            self._steps[tag] = step + 1
        if self._f is None:
            return
        self._f.write(json.dumps({"tag": tag, "value": float(value),
                                  "step": int(step), "ts": time.time()}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def close(self):
        if self._f is not None:
            self._f.close()
        if self._tb is not None:
            self._tb.close()


def set_seed(seed: int):
    """Seed host RNGs (utils.py:84-90); device randomness is explicit PRNG keys."""
    import random

    import numpy as np
    random.seed(seed)
    np.random.seed(seed)
    return seed
