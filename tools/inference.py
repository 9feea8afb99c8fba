"""Standalone single-image inference API (reference: tools/inference.py).

``run_ctd_inference(images, conditions, model_path, vis_thres, args)``: for each
image, each condition pose is turned into a crop (kpt-bbox + margin 25, pixel_std 200,
scale x1.25), a colored condition heatmap is rendered, and the whole per-image stack
runs as ONE jitted forward + decode on device.  Predictions below ``vis_thres`` are
NaN'd out (:140-149).
"""

import argparse

import _init_paths  # noqa: F401
import numpy as np

from buctd_tpu.config import cfg, update_config

# fixed per-dataset palettes, as in the reference (tools/inference.py:75-78) — note
# these differ from the training-time matplotlib rainbow colors
COLORS_CROWDPOSE = [[245, 53, 53], [245, 125, 45], [253, 206, 20], [206, 244, 54],
                    [118, 253, 27], [47, 254, 47], [25, 245, 113], [15, 243, 197],
                    [14, 199, 245], [44, 126, 249], [13, 13, 249], [128, 47, 249],
                    [205, 38, 247], [245, 48, 206]]
COLORS_COCO = [[245, 59, 59], [249, 104, 25], [253, 183, 15], [233, 245, 41],
               [162, 252, 32], [84, 247, 34], [31, 252, 57], [20, 246, 126],
               [5, 249, 206], [52, 215, 249], [33, 136, 252], [11, 39, 248],
               [93, 46, 249], [156, 29, 244], [235, 49, 247], [245, 47, 187],
               [253, 44, 117]]


def get_model(config, model_path):
    import jax
    import jax.numpy as jnp

    from buctd_tpu.data.pipeline import num_input_channels
    from buctd_tpu.models import converter_options, get_model as build

    from buctd_tpu.models import compute_dtype
    model = build(config, is_train=False, dtype=compute_dtype(config))
    img_w, img_h = config.MODEL.IMAGE_SIZE
    sample = jnp.zeros((1, img_h, img_w, num_input_channels(config)))
    template = jax.jit(lambda k: model.init(k, sample, train=False))(
        jax.random.PRNGKey(0))
    if model_path and (model_path.endswith(".pth") or model_path.endswith(".pt")):
        from buctd_tpu.convert import load_torch_checkpoint, torch_to_flax
        variables = torch_to_flax(load_torch_checkpoint(model_path), template,
                                  **converter_options(config.MODEL.NAME))
    elif model_path:
        from buctd_tpu.train.checkpoint import load_params
        variables = load_params(model_path, template=template)
    else:
        variables = template
    from buctd_tpu.models.fuse import maybe_fuse_prenet
    return maybe_fuse_prenet(config, model, variables)


import functools


@functools.lru_cache(maxsize=16)
def _jitted_forward(model, img_h, img_w, hm_h, hm_w, post_process, colors):
    """One jitted pipeline per (model, geometry): defining the jit inside the
    per-image call would re-trace/compile for every image."""
    import jax
    import jax.numpy as jnp

    from buctd_tpu.data.joints_dataset import IMAGENET_MEAN, IMAGENET_STD
    from buctd_tpu.ops import get_final_preds, render_condition_colored

    colors = np.asarray(colors, np.float64)

    @jax.jit
    def forward(variables, crops, conds, centers, scales):
        x = crops / 255.0
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        cond_img = render_condition_colored(conds, colors, (img_h, img_w))
        inp = jnp.concatenate([x, cond_img], axis=-1)
        hm = model.apply(variables, inp, train=False).transpose(0, 3, 1, 2)
        return get_final_preds(hm, centers, scales, (hm_w, hm_h),
                               post_process=post_process)

    return forward


def get_pose_feature(model, variables, image_input, cond_joints_list, vis_thres=0.0):
    """All condition crops of one image -> (P, J, 3) predictions."""
    import cv2
    import jax
    import jax.numpy as jnp

    from buctd_tpu.data.joints_dataset import IMAGENET_MEAN, IMAGENET_STD
    from buctd_tpu.geometry import (affine_transform_points, joints2box,
                                    make_affine, xywh2cs)
    from buctd_tpu.ops import get_final_preds, render_condition_colored

    num_joints = cfg.MODEL.NUM_JOINTS
    colors = np.array(COLORS_CROWDPOSE if num_joints == 14 else COLORS_COCO,
                      np.float64)
    image_input = np.asarray(image_input)
    img_w, img_h = int(cfg.MODEL.IMAGE_SIZE[0]), int(cfg.MODEL.IMAGE_SIZE[1])
    hm_w, hm_h = int(cfg.MODEL.HEATMAP_SIZE[0]), int(cfg.MODEL.HEATMAP_SIZE[1])
    aspect = img_w / img_h

    crops, conds, centers, scales = [], [], [], []
    for cond_joints in cond_joints_list:
        cond_joints = np.asarray(cond_joints, np.float64)
        bbox = joints2box(cond_joints, margin=25,
                          img_w=image_input.shape[1], img_h=image_input.shape[0])
        center, scale = xywh2cs(*bbox, aspect_ratio=aspect, scale_thre=1.25)
        trans = make_affine(center, scale, 0, (img_w, img_h))
        crop = cv2.warpAffine(image_input.astype(np.float32), trans, (img_w, img_h),
                              flags=cv2.INTER_LINEAR)
        tj = cond_joints.copy()
        tj[:, :2] = affine_transform_points(tj[:, :2], trans)
        crops.append(crop)
        conds.append(tj)
        centers.append(center)
        scales.append(scale)

    crops = jnp.asarray(np.stack(crops))
    conds = jnp.asarray(np.stack(conds))
    centers = np.stack(centers)
    scales = np.stack(scales)

    forward = _jitted_forward(model, img_h, img_w, hm_h, hm_w,
                              bool(cfg.TEST.POST_PROCESS), tuple(map(tuple, colors)))
    preds, maxvals = forward(variables, crops, conds, centers, scales)
    preds = np.concatenate([np.asarray(preds), np.asarray(maxvals)], axis=2)
    preds[preds[:, :, 2] < vis_thres] = np.nan
    return preds


def run_ctd_inference(images, conditions, model_path=None, vis_thres=0.0, args=None,
                      refine_iters=1):
    """images: list of HxWx3 RGB arrays; conditions: per-image list of (J, 2+) poses.
    Returns (N, P, J, 3) predictions in image coordinates.

    refine_iters > 1 runs the on-device lax.scan iterative-refinement loop
    (buctd_tpu/core/refine.py) — each round feeds its predictions back as the next
    round's conditions + condition-derived boxes."""
    if args is not None:
        update_config(cfg, args)
    model, variables = get_model(cfg, model_path)
    if refine_iters > 1:
        import jax.numpy as jnp

        from buctd_tpu.core.refine import make_refine_fn
        colors = np.array(COLORS_CROWDPOSE if cfg.MODEL.NUM_JOINTS == 14
                          else COLORS_COCO, np.float64)
        refine = make_refine_fn(cfg, model, colors, n_iters=refine_iters)
        all_preds = []
        for img, conds in zip(images, conditions):
            conds = np.asarray(conds, np.float32)
            if conds.shape[-1] == 2:
                conds = np.concatenate([conds, np.ones((*conds.shape[:-1], 1),
                                                       np.float32)], -1)
            preds, maxvals = refine(variables, jnp.asarray(img), jnp.asarray(conds))
            out = np.concatenate([np.asarray(preds), np.asarray(maxvals)], axis=2)
            out[out[:, :, 2] < vis_thres] = np.nan
            all_preds.append(out)
        return np.array(all_preds)
    all_preds = [get_pose_feature(model, variables, img, conds, vis_thres)
                 for img, conds in zip(images, conditions)]
    return np.array(all_preds)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--image", required=True)
    parser.add_argument("--model", default="")
    parser.add_argument("--vis-thres", type=float, default=0.0)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    a = parser.parse_args()
    a.modelDir = a.logDir = a.dataDir = ""
    update_config(cfg, a)

    from buctd_tpu.data.joints_dataset import imread_rgb
    img = imread_rgb(a.image)
    J = cfg.MODEL.NUM_JOINTS
    center = np.array([img.shape[1] / 2, img.shape[0] / 2])
    demo_cond = center + np.random.RandomState(0).uniform(-60, 60, (J, 2))
    preds = run_ctd_inference([img], [[demo_cond]], a.model or None, a.vis_thres)
    print(preds)
