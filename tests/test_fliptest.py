"""Flip-test protocol parity: our in-jit flip_back / flipped-condition math vs the
reference's numpy implementations (lib/utils/transforms.py)."""

import importlib.util
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/reference/lib")


def _ref_transforms():
    spec = importlib.util.spec_from_file_location(
        "ref_transforms", "/root/reference/lib/utils/transforms.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


FLIP_PAIRS = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12], [13, 14], [15, 16]]


def test_flip_back_nhwc_matches_reference():
    ref = _ref_transforms()
    from buctd_tpu.geometry import flip_pairs_to_perm

    rng = np.random.RandomState(0)
    out = rng.rand(2, 17, 8, 6).astype(np.float32)  # (B, J, h, w)
    want = ref.flip_back(out.copy(), FLIP_PAIRS)

    perm = np.asarray(flip_pairs_to_perm(17, FLIP_PAIRS))
    # our eval step works in NHWC: flip W, permute channel
    nhwc = jnp.array(out.transpose(0, 2, 3, 1))
    got = np.asarray(nhwc[:, :, ::-1, :][..., perm]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_flipped_condition_joints_match_reference_fliplr():
    """The eval step's flipped-condition computation (core/function.py) ==
    reference fliplr_joints incl. the joints * joints_vis masking."""
    ref = _ref_transforms()
    from buctd_tpu.geometry import flip_pairs_to_perm

    rng = np.random.RandomState(1)
    W = 288
    cj = rng.uniform(0, 280, (17, 3))
    cv = np.zeros((17, 3))
    vis = (rng.rand(17) > 0.3).astype(np.float64)
    cv[:, 0] = cv[:, 1] = vis

    want, want_vis = ref.fliplr_joints(cj.copy(), cv.copy(), W, FLIP_PAIRS)

    perm = np.asarray(flip_pairs_to_perm(17, FLIP_PAIRS))
    cjj = jnp.array(cj[None])
    cvv = jnp.array(cv[None])[:, perm]
    got = np.asarray(cjj.at[..., 0].set(W - cjj[..., 0] - 1)[:, perm] * cvv)[0]
    np.testing.assert_allclose(got, want, atol=1e-4)  # f32 device math vs f64 ref


def test_shift_heatmap_matches_reference_semantics():
    rng = np.random.RandomState(2)
    out_f = rng.rand(2, 17, 8, 6).astype(np.float32)  # NCHW reference layout
    # reference: output_flipped[:, :, :, 1:] = output_flipped[:, :, :, 0:-1]
    want = out_f.copy()
    want[:, :, :, 1:] = out_f[:, :, :, :-1]

    nhwc = jnp.array(out_f.transpose(0, 2, 3, 1))
    got = np.asarray(nhwc.at[:, :, 1:, :].set(nhwc[:, :, :-1, :]))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-7)


def test_plain_condition_flip_rerenders_as_colored():
    """flip_hm dispatches on channel count (transforms.py:37): a PLAIN 3-channel
    condition is re-rendered as COLORED from flipped joints.  Our eval step must
    reproduce that, not mirror the plain map."""
    import torch
    import types as _types

    from test_data_pipeline import _cfg, _ref_joints_dataset, _torch_normalize
    from buctd_tpu.data.pipeline import render_condition
    from buctd_tpu.geometry import flip_pairs_to_perm

    ref = _ref_transforms()
    cfg = _cfg(["MODEL.CONDITIONAL_TOPDOWN", "True", "DATASET.COLORED", "False",
                "MODEL.IMAGE_SIZE", "[96, 128]"])
    ref_jd = _ref_joints_dataset(cfg, False, _torch_normalize)

    rng = np.random.RandomState(0)
    J, W, H = 17, 96, 128
    cj = np.zeros((1, J, 3))
    cj[0, :, 0] = rng.uniform(5, 90, J)
    cj[0, :, 1] = rng.uniform(5, 120, J)
    cv = np.ones((1, J, 3))
    cv[..., 2] = 0

    # reference: flip_hm on a plain (3-channel) rendered condition
    # (.copy(): the reference's fliplr_joints mutates the passed joints in place)
    plain = np.asarray(render_condition(jnp.array(cj), "plain", (H, W)))
    want = ref.flip_hm(torch.from_numpy(plain.transpose(0, 3, 1, 2).copy()),
                       ref_jd, torch.from_numpy(cj.copy()),
                       torch.from_numpy(cv.copy()))
    want = want.numpy().transpose(0, 2, 3, 1)

    # ours: flipped joints (vis-masked) -> COLORED re-render
    perm = np.asarray(flip_pairs_to_perm(J, ref_jd.flip_pairs))
    cjj = jnp.array(cj)
    cvv = jnp.array(cv)[:, perm]
    cjf = cjj.at[..., 0].set(W - cjj[..., 0] - 1)[:, perm] * cvv
    # the reference's get_colors_from_cmap yields J+1 colors for J=17; its zip()
    # silently drops the extras (JointsDataset.py:524) — trim to J
    got = np.asarray(render_condition(cjf, "colored", (H, W),
                                      np.asarray(ref_jd.kpt_colors)[:J]))
    np.testing.assert_allclose(got, want, atol=1.5)  # cv2-vs-device blur tails
