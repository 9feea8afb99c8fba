"""Fully device-side batch preprocessing for training (SURVEY.md §7 hard part #2).

The standard ``Loader`` warps crops on the host with cv2 (reference-exact).  This
pipeline moves the ENTIRE dense per-batch preprocessing into one jitted program on
the TPU; the host only decodes images, draws augmentation parameters, and composes
affines:

  host  : decode -> condition choice / synthesis -> bbox + augmentation draws ->
          compose (flip ∘ crop) affine -> transform joints (cheap numpy)
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

from ..geometry import make_affine
from ..ops import generate_target, warp_affine_rotated
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
        self.ds = dataset
        self.cfg = cfg
        self.is_train = dataset.is_train
        self.batch = batch_size or (cfg.TRAIN.BATCH_SIZE_PER_GPU if self.is_train
                                    else cfg.TEST.BATCH_SIZE_PER_GPU)
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.pool = ThreadPoolExecutor(max_workers=num_workers)
        self.drop_last = drop_last
        self.img_w, self.img_h = int(cfg.MODEL.IMAGE_SIZE[0]), int(cfg.MODEL.IMAGE_SIZE[1])
        self.colors = np.asarray(dataset.kpt_colors, np.float32)
        self.joints_weight = getattr(dataset, "joints_weight", None)

    # ------------------------------------------------------------------
    def _host_sample(self, idx):
        """Per-sample host work: everything data-dependent, nothing dense."""
        import copy
        import random

        from .joints_dataset import imread_rgb

        ds = self.ds
        db_rec = copy.deepcopy(ds.db[idx])
        img = imread_rgb(db_rec["image"], ds.color_rgb, ds.data_format)
        H, W = img.shape[:2]

        joints = np.asarray(db_rec["joints_3d"], np.float64).copy()
        joints_vis = np.asarray(db_rec["joints_3d_vis"], np.float64).copy()
        cond_joints, cond_joints_vis = ds._choose_condition(db_rec, joints, joints_vis)
        has_cond = cond_joints is not None

        use_bu_bbox = db_rec.get("use_bu_bbox", False)
        # NB reference quirk: the second guard reads ONLY joint 0's y
        # (JointsDataset.py:218) — see joints_dataset.get_sample
        if (use_bu_bbox and has_cond and cond_joints[:, 0].sum() != 0
                and cond_joints[0, 1].sum() != 0):
            nzx = np.nonzero(cond_joints[:, 0])
            nzy = np.nonzero(cond_joints[:, 1])
            xmin = np.clip(np.min(cond_joints[:, 0][nzx]) - ds.bu_bbox_margin, 0, W)
            xmax = np.clip(np.max(cond_joints[:, 0][nzx]) + ds.bu_bbox_margin, 0, W)
            ymin = np.clip(np.min(cond_joints[:, 1][nzy]) - ds.bu_bbox_margin, 0, H)
            ymax = np.clip(np.max(cond_joints[:, 1][nzy]) + ds.bu_bbox_margin, 0, H)
            bbox = [xmin, ymin, xmax - xmin, ymax - ymin]
            c, s = ds._xywh2cs(*bbox)
        else:
            c = np.array(db_rec["center"], np.float64).copy()
            s = np.array(db_rec["scale"], np.float64).copy()
            bbox = db_rec.get("bbox", [0, 0, W, H])
        score = db_rec.get("score", 1)
        r, flipped = 0.0, False

        if ds.is_train:
            if (np.sum(joints_vis[:, 0]) > ds.num_joints_half_body
                    and np.random.rand() < ds.prob_half_body):
                c_hb, s_hb = ds.half_body_transform(joints, joints_vis)
                if c_hb is not None and s_hb is not None:
                    c, s = c_hb, s_hb
            sf, rf = ds.scale_factor, ds.rotation_factor
            s = s * np.clip(np.random.randn() * sf + 1, 1 - sf, 1 + sf)
            r = (np.clip(np.random.randn() * rf, -rf * 2, rf * 2)
                 if random.random() <= 0.6 else 0)
            if ds.flip and random.random() <= 0.5:
                flipped = True
                from ..geometry import fliplr_joints
                joints, joints_vis = fliplr_joints(joints, joints_vis, W, ds.flip_pairs)
                c = c.copy()
                c[0] = W - c[0] - 1
                if has_cond:
                    cond_joints, cond_joints_vis = fliplr_joints(
                        cond_joints, cond_joints_vis, W, ds.flip_pairs)

        # crop-frame affine in the (possibly flipped) frame...
        trans = make_affine(c, s, r, ds.image_size)
        trans_inv = make_affine(c, s, r, ds.image_size, inv=True)
        # ...composed with the horizontal flip so the DEVICE warps the ORIGINAL
        # image: sample original x at W - 1 - x_flipped
        if flipped:
            F = np.array([[-1.0, 0.0, W - 1.0], [0.0, 1.0, 0.0]])
            trans_inv = F @ np.vstack([trans_inv, [0.0, 0.0, 1.0]])

        # crop-style aug box, in the ORIGINAL image frame for device masking
        mask_box = np.array([0, 0, W, H], np.float64)
        if ds.new_crop_aug and ds.is_train:
            x, y, w, h = np.array(bbox).astype(int)
            if ds.bbox_aug:
                x_d = w * random.randint(0, 20) // 10
                y_d = h * random.randint(0, 20) // 10
                x = int(x - x_d) if x - x_d > 0 else 0
                y = int(y - y_d) if y - y_d > 0 else 0
                w = int(w + 2 * x_d)
                h = int(h + 2 * y_d)
            if flipped:  # bbox was computed in the original frame
                x = W - x - w
            mask_box = np.array([x, y, w, h], np.float64)

        vis_mask = joints_vis[:, 0] > 0
        from ..geometry import affine_transform_points
        joints[vis_mask, 0:2] = affine_transform_points(joints[vis_mask, 0:2], trans)
        if has_cond:
            cvis = cond_joints_vis[:, 0] > 0
            cond_joints[cvis, 0:2] = affine_transform_points(
                cond_joints[cvis, 0:2], trans)
        else:
            cond_joints = np.zeros((ds.num_joints, 3))
            cond_joints_vis = np.zeros((ds.num_joints, 3))

        return {
            "image": img,
            "trans_inv": trans_inv.astype(np.float32),
            "mask_box": mask_box.astype(np.float32),
            "joints": joints.astype(np.float32),
            "joints_vis": joints_vis.astype(np.float32),
            "cond_joints": cond_joints.astype(np.float32),
            "cond_joints_vis": cond_joints_vis.astype(np.float32),
            "has_cond": np.float32(has_cond and ds.condition_topdown),
            "center": np.asarray(c, np.float32),
            "scale": np.asarray(s, np.float32),
            "rotation": np.float32(r),
            "score": np.float32(score),
            "annotation_id": np.int64(db_rec.get("annotation_id", -1)),
            "cond_max_iou": np.float32(db_rec.get("cond_max_iou", 0.0)),
            "image_path": db_rec["image"],
        }

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

            crops = warp_affine_rotated(x, trans_inv, (img_h, img_w))
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
        n = len(self.ds)
        return n // self.batch if self.drop_last else -(-n // self.batch)

    def __iter__(self):
        order = np.arange(len(self.ds))
        if self.shuffle:
            self.rng.shuffle(order)
        for i in range(0, len(order), self.batch):
            idxs = order[i:i + self.batch]
            if len(idxs) < self.batch:
                if self.drop_last:
                    return
                idxs = np.concatenate([idxs, np.repeat(idxs[-1:],
                                                       self.batch - len(idxs))])
            samples = list(self.pool.map(self._host_sample, idxs))

            hb = _bucket(max(s["image"].shape[0] for s in samples))
            wb = _bucket(max(s["image"].shape[1] for s in samples))
            images = np.zeros((self.batch, hb, wb, 3), np.uint8)
            for k, s in enumerate(samples):
                im = s["image"]
                images[k, :im.shape[0], :im.shape[1]] = im

            batch = {k: np.stack([s[k] for s in samples])
                     for k in samples[0] if k not in ("image", "image_path")}
            batch["image_path"] = [s["image_path"] for s in samples]
            batch["valid"] = (np.arange(self.batch) <
                              min(self.batch, len(order) - i)).astype(np.float32)

            fn = self._device_fn((hb, wb))
            inp, tgt, tw = fn(images, batch["trans_inv"], batch["mask_box"],
                              batch["joints"], batch["joints_vis"],
                              batch["cond_joints"])
            batch["input"], batch["target"], batch["target_weight"] = inp, tgt, tw
            yield batch
