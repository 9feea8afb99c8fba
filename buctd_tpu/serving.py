"""Production serving API: one jitted crop->render->forward->decode(->refine)
pipeline per (image-bucket, instance-bucket) shape.

The reference's closest surface is tools/inference.py's per-call python loop; this
wraps the same model + protocol behind a persistent estimator with shape-bucketed
compilation, so repeated calls hit the jit cache.

    est = PoseEstimator(cfg, checkpoint="model.pth", refine_iters=3)
    preds = est.predict(image_rgb, condition_poses)   # (P, J, 3) image coords
"""

from __future__ import annotations

import numpy as np

from .core.refine import make_refine_fn
from .data.joints_dataset import rainbow_colors

IMG_BUCKETS = (256, 384, 512, 640, 768, 1024, 1536, 2048)
POSE_BUCKETS = (1, 2, 4, 8, 16, 32, 64)


def _bucket(v: int, buckets) -> int:
    for b in buckets:
        if v <= b:
            return b
    return v


class PoseEstimator:
    """Conditional top-down pose estimation as a persistent, jit-cached service."""

    def __init__(self, cfg, checkpoint: str | None = None, refine_iters: int = 1,
                 colors=None):
        import jax
        import jax.numpy as jnp

        from .data.pipeline import num_input_channels
        from .models import compute_dtype, converter_options, get_model

        self.cfg = cfg
        self.num_joints = int(cfg.MODEL.NUM_JOINTS)
        self.model = get_model(cfg, is_train=False,
                               dtype=compute_dtype(cfg, "EVAL_DTYPE"))
        img_w, img_h = cfg.MODEL.IMAGE_SIZE
        sample = jnp.zeros((1, img_h, img_w, num_input_channels(cfg)))
        template = jax.jit(lambda k: self.model.init(k, sample, train=False))(
            jax.random.PRNGKey(0))
        if checkpoint and (checkpoint.endswith(".pth") or checkpoint.endswith(".pt")):
            from .convert import load_torch_checkpoint, torch_to_flax
            self.variables = torch_to_flax(load_torch_checkpoint(checkpoint),
                                           template,
                                           **converter_options(cfg.MODEL.NAME))
        elif checkpoint:
            from .train.checkpoint import load_params
            self.variables = load_params(checkpoint, template=template)
        else:
            self.variables = template

        self.colors = (np.asarray(colors) if colors is not None
                       else rainbow_colors(self.num_joints))
        self.refine = make_refine_fn(cfg, self.model, self.colors,
                                     n_iters=max(int(refine_iters), 1))

    def predict(self, image, condition_poses, vis_thres: float = 0.0) -> np.ndarray:
        """image: (H, W, 3) RGB; condition_poses: (P, J, 2 or 3) image-frame poses.
        Returns (P, J, 3) [x, y, conf] in image coordinates."""
        import jax.numpy as jnp

        image = np.asarray(image)
        conds = np.asarray(condition_poses, np.float32)
        if conds.ndim == 2:
            conds = conds[None]
        P = conds.shape[0]
        if conds.shape[-1] == 2:
            conds = np.concatenate(
                [conds, np.ones((*conds.shape[:-1], 1), np.float32)], -1)

        # pad to buckets so repeated calls reuse compiled programs
        hb = _bucket(image.shape[0], IMG_BUCKETS)
        wb = _bucket(image.shape[1], IMG_BUCKETS)
        img_pad = np.zeros((hb, wb, 3), image.dtype)
        img_pad[:image.shape[0], :image.shape[1]] = image
        pb = _bucket(P, POSE_BUCKETS)
        if pb != P:  # pad with copies of the first pose; sliced off below
            conds = np.concatenate([conds, np.repeat(conds[:1], pb - P, 0)])

        true_wh = jnp.asarray([image.shape[1], image.shape[0]], jnp.float32)
        preds, maxvals = self.refine(self.variables, jnp.asarray(img_pad),
                                     jnp.asarray(conds), img_wh=true_wh)
        out = np.concatenate([np.asarray(preds), np.asarray(maxvals)], axis=2)[:P]
        out[out[:, :, 2] < vis_thres] = np.nan
        return out

    def predict_many(self, images, conditions, vis_thres: float = 0.0) -> list:
        """Convenience loop over images (each with its own condition set)."""
        return [self.predict(img, conds, vis_thres)
                for img, conds in zip(images, conditions)]
