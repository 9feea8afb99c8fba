"""Batched device-side preprocessing + a threaded loader.

The reference does per-sample cv2/numpy work in 24 torch DataLoader workers
(tools/train.py:185-199).  Here the per-sample host work (decode/augment/crop,
joints_dataset.py) runs in a thread pool, and everything dense runs as ONE jitted
program per batch on the TPU: imagenet normalization, condition rendering, channel
concat, and target-Gaussian synthesis.  Conditions cross the host->device boundary as
(B, J, 3) joints, not heatmaps — 3 orders of magnitude less transfer than the
reference's per-sample (3, 384, 288) condition images, and flip-test can re-render
them on device.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (generate_target, render_condition_colored,
                   render_condition_plain, render_condition_stacked)
from .joints_dataset import IMAGENET_MEAN, IMAGENET_STD

META_KEYS = ("center", "scale", "rotation", "score", "annotation_id",
             "cond_max_iou", "joints", "joints_vis", "cond_joints",
             "cond_joints_vis", "has_cond")


def collate(samples: list) -> dict:
    """Stack sample dicts into fixed-shape numpy batch arrays."""
    batch = {"image": np.stack([s["image"] for s in samples]),
             "image_path": [s["image_path"] for s in samples]}
    for k in META_KEYS:
        batch[k] = np.stack([np.asarray(s[k]) for s in samples])
    return batch


def condition_mode(cfg) -> str:
    if cfg.DATASET.STACKED_CONDITION:
        return "stacked"
    if cfg.DATASET.COLORED:
        return "colored"
    return "plain"


def num_input_channels(cfg) -> int:
    """3 / 6 / 3+J input channels (tools/train.py:109-121)."""
    if not cfg.MODEL.CONDITIONAL_TOPDOWN:
        return 3
    if cfg.DATASET.STACKED_CONDITION:
        return 3 + int(cfg.MODEL.NUM_JOINTS)
    return 6


def render_condition(cond_joints, mode: str, out_hw, colors=None,
                     precision="highest"):
    """Dispatch to the three condition encodings (all return (B, H, W, c)).

    precision='default' is the serving fast path (bf16 MXU passes) for the
    colored/stacked renders; the plain render always stays exact (its trunc-to-int
    amplifies bf16 error to a full intensity level — see ops/heatmap.py).
    """
    if mode == "stacked":
        return render_condition_stacked(cond_joints, out_hw, precision=precision)
    if mode == "colored":
        return render_condition_colored(cond_joints, colors, out_hw,
                                        precision=precision)
    return render_condition_plain(cond_joints, out_hw)


def device_synthesize_batch(loader, idxs):
    """One jitted condition synthesis for a whole batch (TPU.DEVICE_SYNTHESIS);
    shared by Loader and DeviceLoader.  Returns per-sample condition arrays for
    plan_sample's cond_override, or Nones to keep the host sampler."""
    if loader.device_synth is None:
        return [None] * len(idxs)
    import jax

    seeds = [loader.ds.synthesis_seed(loader.ds.db[i]) for i in idxs]
    key = jax.random.fold_in(jax.random.PRNGKey(loader._synth_seed),
                             loader._synth_step)
    loader._synth_step += 1
    out = loader.device_synth(
        key, np.stack([s[0] for s in seeds]), np.stack([s[1] for s in seeds]),
        [s[2] for s in seeds], np.array([s[3] for s in seeds]))
    return list(out)


def _process_info():
    """(process_index, process_count) — indirection so loader-sharding logic is
    testable without spawning real jax.distributed processes."""
    import jax

    return jax.process_index(), jax.process_count()


def local_batch_size(global_batch: int) -> int:
    """This process's share of a global batch (SURVEY.md §2.8 multi-host plan).

    Loaders take the GLOBAL batch size (the reference's DataParallel semantics:
    BATCH_SIZE_PER_GPU * #devices, tools/train.py:187) and serve only this
    process's contiguous rows of it; ``parallel.mesh.shard_batch`` then assembles
    the global device array from the per-process rows without data movement.
    """
    _, k = _process_info()
    if k == 1:
        return global_batch
    if global_batch % k:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count {k}")
    return global_batch // k


def shard_epoch_order(order: np.ndarray):
    """Slice a GLOBAL per-epoch sample order into this process's shard.

    Returns (local_order, n_valid): a contiguous slice of ``order`` padded (by
    repeating the last index) to the common per-process length ceil(n/k), so
    every process runs the SAME number of jitted (hence collective) steps; rows
    past n_valid are padding and must be flagged invalid.  The epoch order must
    be built identically on every process (same seed) for disjoint coverage.
    """
    p, k = _process_info()
    if k == 1:
        return order, len(order)
    per = -(-len(order) // k)
    shard = order[p * per:(p + 1) * per]
    n_valid = len(shard)
    if n_valid == 0:          # degenerate: more processes than samples
        shard = order[-1:]
        n_valid = 0
    if len(shard) < per:
        shard = np.concatenate([shard, np.repeat(shard[-1:], per - len(shard))])
    return shard, n_valid


def shard_length(n_total: int) -> int:
    """Per-process padded shard length for an n_total-sample dataset."""
    _, k = _process_info()
    return n_total if k == 1 else -(-n_total // k)


def make_input_fn(cfg, colors):
    """Jitted: uint8/float crops + condition joints -> model input (B, H, W, C).

    RGB is ToTensor+Normalize'd (imagenet stats); condition channels stay raw 0..255,
    exactly as the reference concatenates them (JointsDataset.py:345,
    tools/train.py:167-183).
    """
    img_w, img_h = int(cfg.MODEL.IMAGE_SIZE[0]), int(cfg.MODEL.IMAGE_SIZE[1])
    mode = condition_mode(cfg)
    conditional = bool(cfg.MODEL.CONDITIONAL_TOPDOWN)
    colors = np.asarray(colors, np.float32)

    @jax.jit
    def input_fn(images, cond_joints):
        x = images.astype(jnp.float32) / 255.0
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        if not conditional:
            return x
        cond = render_condition(cond_joints, mode, (img_h, img_w), colors)
        return jnp.concatenate([x, cond], axis=-1)

    return input_fn


def make_target_fn(cfg, joints_weight=None):
    """Jitted: crop-frame joints -> (target (B, h, w, J), weight (B, J)).

    Matches generate_target incl. the USE_DIFFERENT_JOINTS_WEIGHT multiply
    (JointsDataset.py:449-451).
    """
    image_size = (int(cfg.MODEL.IMAGE_SIZE[0]), int(cfg.MODEL.IMAGE_SIZE[1]))
    heatmap_size = (int(cfg.MODEL.HEATMAP_SIZE[0]), int(cfg.MODEL.HEATMAP_SIZE[1]))
    sigma = int(cfg.MODEL.SIGMA)
    use_jw = bool(cfg.LOSS.USE_DIFFERENT_JOINTS_WEIGHT) and joints_weight is not None
    jw = (np.asarray(joints_weight, np.float32).reshape(1, -1)
          if use_jw else None)

    @jax.jit
    def target_fn(joints, joints_vis):
        tgt, w = generate_target(joints, joints_vis, image_size, heatmap_size, sigma)
        if jw is not None:
            w = w * jw
        return tgt.transpose(0, 2, 3, 1), w  # NHWC for the flax models

    return target_fn


class Loader:
    """Threaded batch loader over a JointsDataset.

    Yields dicts with 'input' (B, H, W, C) ready for the model, 'target'/'target_weight'
    (train), and host-side meta.  The final partial batch is padded by repeating the
    last sample, with 'valid' marking real rows (fixed shapes for jit).
    """

    def __init__(self, dataset, cfg, batch_size=None, shuffle=False, num_workers=8,
                 is_train=None, seed=0, drop_last=False):
        self.ds = dataset
        self.cfg = cfg
        self.is_train = dataset.is_train if is_train is None else is_train
        # batch_size is the GLOBAL batch; multi-host serves only this process's
        # contiguous rows of it (local_batch_size), over its shard of the order
        self.global_batch = batch_size or (
            cfg.TRAIN.BATCH_SIZE_PER_GPU if self.is_train
            else cfg.TEST.BATCH_SIZE_PER_GPU)
        self.batch = local_batch_size(self.global_batch)
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.pool = ThreadPoolExecutor(max_workers=num_workers)
        self.drop_last = drop_last
        self.input_fn = make_input_fn(cfg, dataset.kpt_colors)
        self.target_fn = make_target_fn(cfg, getattr(dataset, "joints_weight", None))
        self.device_synth = None
        if (bool(getattr(cfg.TPU, "DEVICE_SYNTHESIS", False)) and self.is_train
                and getattr(dataset, "synthesis_pose", False)
                and getattr(dataset, "condition_topdown", False)):
            # batched accelerator synthesis replaces the ~97 ms/sample host
            # sampler; plan_sample consumes the result via cond_override
            from .pose_synthesis_jax import make_synthesize_fn
            self.device_synth = make_synthesize_fn(cfg)
            self._synth_step = 0
            self._synth_seed = seed

    def __len__(self):
        n = shard_length(len(self.ds))
        return n // self.batch if self.drop_last else -(-n // self.batch)

    def _synthesize_batch(self, idxs):
        return device_synthesize_batch(self, idxs)

    def __iter__(self):
        # the GLOBAL order is built identically on every process (same seed);
        # shard_epoch_order slices this process's contiguous piece of it
        order = np.arange(len(self.ds))
        if self.shuffle:
            self.rng.shuffle(order)
        order, n_valid = shard_epoch_order(order)
        for i in range(0, len(order), self.batch):
            idxs = order[i:i + self.batch]
            if len(idxs) < self.batch:
                if self.drop_last:
                    return
                idxs = np.concatenate([idxs, np.repeat(idxs[-1:],
                                                       self.batch - len(idxs))])
            conds = self._synthesize_batch(idxs)
            samples = list(self.pool.map(
                lambda a: self.ds.get_sample(a[0], cond_override=a[1]),
                zip(idxs, conds)))
            batch = collate(samples)
            # global db row of each sample: validate()'s multi-host merge
            # rebuilds image paths from these, so a shuffled eval order can
            # never silently corrupt the merged path list
            batch["db_index"] = idxs.astype(np.int64)
            batch["valid"] = (np.arange(self.batch) <
                              max(0, min(self.batch, n_valid - i))
                              ).astype(np.float32)
            batch["input"] = self.input_fn(batch.pop("image"), batch["cond_joints"])
            # targets at train AND eval: the reference's val loop also computes
            # loss/PCK against generated targets (core/function.py:239-248)
            tgt, tw = self.target_fn(batch["joints"], batch["joints_vis"][..., 0])
            batch["target"], batch["target_weight"] = tgt, tw
            yield batch
