"""Fully device-side batch preprocessing for training (SURVEY.md §7 hard part #2).

The standard ``Loader`` warps crops on the host with cv2 (reference-exact).  This
pipeline moves the ENTIRE dense per-batch preprocessing into one jitted program on
the TPU; the host only decodes images, draws augmentation parameters, and composes
affines:

  host  : JointsDataset.plan_sample — decode, condition choice / synthesis,
          bbox + augmentation draws, crop affine, joint transforms (cheap numpy)
  device: crop-aug rectangle masking -> rotated banded-matmul warp ->
          imagenet normalize -> condition render -> channel concat ->
          target Gaussians — one XLA program per image-bucket shape.

Images are padded into power-of-two-ish buckets so the jit cache stays small; each
distinct bucket shape compiles once.
"""

from __future__ import annotations

import functools
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import generate_target
from ..ops.warp import warp_affine_general
from .joints_dataset import IMAGENET_MEAN, IMAGENET_STD
from .pipeline import condition_mode, render_condition

BUCKETS = (256, 384, 512, 640, 768, 1024, 1536, 2048)


def _bucket(v: int) -> int:
    for b in BUCKETS:
        if v <= b:
            return b
    return -(-v // 512) * 512


class DeviceLoader:
    """Batch loader with on-device preprocessing.

    Yields the same batch dict as ``pipeline.Loader`` ('input', 'target',
    'target_weight', meta...), but the warp/render/target work runs on the TPU.
    """

    def __init__(self, dataset, cfg, batch_size=None, shuffle=False, num_workers=8,
                 seed=0, drop_last=False):
        from .pipeline import local_batch_size
        self.ds = dataset
        self.cfg = cfg
        self.is_train = dataset.is_train
        # GLOBAL batch in, per-process local rows out (see pipeline.Loader)
        self.global_batch = batch_size or (
            cfg.TRAIN.BATCH_SIZE_PER_GPU if self.is_train
            else cfg.TEST.BATCH_SIZE_PER_GPU)
        self.batch = local_batch_size(self.global_batch)
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.pool = ThreadPoolExecutor(max_workers=num_workers)
        self.drop_last = drop_last
        self.img_w, self.img_h = int(cfg.MODEL.IMAGE_SIZE[0]), int(cfg.MODEL.IMAGE_SIZE[1])
        self.colors = np.asarray(dataset.kpt_colors, np.float32)
        self.joints_weight = getattr(dataset, "joints_weight", None)
        self.device_synth = None
        if (bool(getattr(cfg.TPU, "DEVICE_SYNTHESIS", False)) and self.is_train
                and getattr(dataset, "synthesis_pose", False)
                and getattr(dataset, "condition_topdown", False)):
            from .pose_synthesis_jax import make_synthesize_fn
            self.device_synth = make_synthesize_fn(cfg)
            self._synth_step = 0
            self._synth_seed = seed

    # ------------------------------------------------------------------
    def _host_sample(self, idx, cond_override=None):
        """Per-sample host work — JointsDataset.plan_sample plus device packaging
        (the dict carries the possibly-FLIPPED source view; padding into the
        bucket buffer copies it anyway, so no affine composition is needed)."""
        plan = self.ds.plan_sample(idx, cond_override=cond_override)
        H, W = plan["image"].shape[:2]
        mask_box = (np.array(plan["mask_box"], np.float64)
                    if plan["mask_box"] is not None
                    else np.array([0, 0, W, H], np.float64))
        plan["mask_box"] = mask_box.astype(np.float32)
        plan["trans_inv"] = plan["trans_inv"].astype(np.float32)
        plan.pop("trans")
        return plan

    # ------------------------------------------------------------------
    @functools.lru_cache(maxsize=32)
    def _device_fn(self, bucket_hw):
        cfg = self.cfg
        img_w, img_h = self.img_w, self.img_h
        hm_w, hm_h = int(cfg.MODEL.HEATMAP_SIZE[0]), int(cfg.MODEL.HEATMAP_SIZE[1])
        sigma = int(cfg.MODEL.SIGMA)
        mode = condition_mode(cfg)
        conditional = bool(cfg.MODEL.CONDITIONAL_TOPDOWN)
        colors = self.colors
        use_jw = bool(cfg.LOSS.USE_DIFFERENT_JOINTS_WEIGHT) and self.joints_weight is not None
        jw = (np.asarray(self.joints_weight, np.float32).reshape(1, -1)
              if use_jw else None)

        @jax.jit
        def fn(images, trans_inv, mask_box, joints, joints_vis, cond_joints):
            B, H, W, _ = images.shape
            x = images.astype(jnp.float32)
            bx, by, bw, bh = (mask_box[:, 0], mask_box[:, 1],
                              mask_box[:, 2], mask_box[:, 3])
            xs = jax.lax.broadcasted_iota(jnp.float32, (1, 1, W), 2)
            ys = jax.lax.broadcasted_iota(jnp.float32, (1, H, 1), 1)
            inside = ((xs >= bx[:, None, None]) & (xs < (bx + bw)[:, None, None])
                      & (ys >= by[:, None, None]) & (ys < (by + bh)[:, None, None]))
            x = x * inside[..., None]

            crops = warp_affine_general(x, trans_inv, (img_h, img_w),
                                        engine=str(cfg.TPU.WARP_ENGINE))
            crops = jnp.round(crops)  # host path warps uint8 (cv2 rounds); match it
            rgb = (crops / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
            if conditional:
                cond = render_condition(cond_joints, mode, (img_h, img_w), colors)
                inp = jnp.concatenate([rgb, cond], axis=-1)
            else:
                inp = rgb
            tgt, tw = generate_target(joints, joints_vis[..., 0],
                                      (img_w, img_h), (hm_w, hm_h), sigma)
            if jw is not None:
                tw = tw * jw
            return inp, tgt.transpose(0, 2, 3, 1), tw

        return fn

    def __len__(self):
        from .pipeline import shard_length
        n = shard_length(len(self.ds))
        return n // self.batch if self.drop_last else -(-n // self.batch)

    def __iter__(self):
        from .pipeline import shard_epoch_order
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
            from .pipeline import device_synthesize_batch
            conds = device_synthesize_batch(self, idxs)
            samples = list(self.pool.map(
                lambda a: self._host_sample(a[0], cond_override=a[1]),
                zip(idxs, conds)))

            hb = _bucket(max(s["image"].shape[0] for s in samples))
            wb = _bucket(max(s["image"].shape[1] for s in samples))
            images = np.zeros((self.batch, hb, wb, 3), np.uint8)
            for k, s in enumerate(samples):
                im = s["image"]
                images[k, :im.shape[0], :im.shape[1]] = im

            batch = {k: np.stack([s[k] for s in samples])
                     for k in samples[0] if k not in ("image", "image_path")}
            batch["image_path"] = [s["image_path"] for s in samples]
            # see pipeline.Loader.__iter__: db row ids for the multi-host merge
            batch["db_index"] = idxs.astype(np.int64)
            batch["valid"] = (np.arange(self.batch) <
                              max(0, min(self.batch, n_valid - i))
                              ).astype(np.float32)

            fn = self._device_fn((hb, wb))
            inp, tgt, tw = fn(images, batch["trans_inv"], batch["mask_box"],
                              batch["joints"], batch["joints_vis"],
                              batch["cond_joints"])
            batch["input"], batch["target"], batch["target_weight"] = inp, tgt, tw
            yield batch
