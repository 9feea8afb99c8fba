"""Ops parity tests vs cv2/numpy oracles that implement the reference's semantics
(JointsDataset.py generate_target/get_*condition*, core/inference.py decode)."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from buctd_tpu.geometry import make_affine
from buctd_tpu.ops import (
    crop_images,
    dark_blur,
    gaussian_blur2d,
    generate_target,
    get_final_preds,
    get_max_preds,
    render_condition_colored,
    render_condition_plain,
    render_condition_stacked,
    warp_affine,
)
from buctd_tpu.ops.decode import dark_refine, post_process_nudge

RNG = np.random.RandomState(42)


# ---------------------------------------------------------------- warp

def test_warp_matches_cv2_float():
    H, W, C = 128, 160, 3
    img = RNG.rand(H, W, C).astype(np.float32) * 255
    cases = [
        ([80.0, 60.0], [0.6, 0.8], 0.0),
        ([40.0, 100.0], [0.5, 0.5], 35.0),
        ([150.0, 20.0], [1.2, 0.9], -60.0),
    ]
    out_size = (72, 96)  # (w, h)
    for c, s, r in cases:
        fwd = make_affine(c, s, r, out_size)
        want = cv2.warpAffine(img, fwd[:2], out_size, flags=cv2.INTER_LINEAR)
        inv = make_affine(c, s, r, out_size, inv=True)
        got = np.asarray(warp_affine(jnp.array(img[None]), jnp.array(inv[None], jnp.float32),
                                     (out_size[1], out_size[0])))[0]
        # cv2's float path is exact; ours differs only by fp32 rounding
        np.testing.assert_allclose(got, want, atol=0.35, rtol=1e-4)


def test_crop_images_wrapper():
    H, W = 100, 120
    img = RNG.rand(H, W, 3).astype(np.float32)
    c = np.array([[60.0, 50.0]], np.float32)
    s = np.array([[0.5, 0.6]], np.float32)
    out = crop_images(jnp.array(img[None]), c, s, np.zeros(1, np.float32), (48, 64))
    assert out.shape == (1, 64, 48, 3)
    fwd = make_affine(c[0], s[0], 0, (48, 64))
    want = cv2.warpAffine(img, fwd[:2], (48, 64))
    np.testing.assert_allclose(np.asarray(out)[0], want, atol=0.3, rtol=1e-4)


# ---------------------------------------------------------------- blur

def test_gaussian_blur_matches_cv2():
    x = RNG.rand(64, 48, 3).astype(np.float32) * 255
    want = cv2.GaussianBlur(x.astype(np.float64), (15, 15), 0)
    got = np.asarray(gaussian_blur2d(jnp.array(x), 15))
    np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-4)


# ---------------------------------------------------------------- target

def _oracle_target(joints, joints_vis, image_size, heatmap_size, sigma):
    """Reference-semantics stamped gaussian (JointsDataset.py:397-453)."""
    J = joints.shape[0]
    w, h = heatmap_size
    weight = joints_vis[:, 0].astype(np.float32).copy()
    target = np.zeros((J, h, w), np.float32)
    tmp = sigma * 3
    for j in range(J):
        mu_x = int(joints[j, 0] / (image_size[0] / w) + 0.5)
        mu_y = int(joints[j, 1] / (image_size[1] / h) + 0.5)
        ul = [mu_x - tmp, mu_y - tmp]
        br = [mu_x + tmp + 1, mu_y + tmp + 1]
        if ul[0] >= w or ul[1] >= h or br[0] < 0 or br[1] < 0:
            weight[j] = 0
            continue
        size = 2 * tmp + 1
        xg = np.arange(size, dtype=np.float32)
        yg = xg[:, None]
        x0 = y0 = size // 2
        g = np.exp(-((xg - x0) ** 2 + (yg - y0) ** 2) / (2 * sigma**2))
        gx = max(0, -ul[0]), min(br[0], w) - ul[0]
        gy = max(0, -ul[1]), min(br[1], h) - ul[1]
        ix = max(0, ul[0]), min(br[0], w)
        iy = max(0, ul[1]), min(br[1], h)
        if weight[j] > 0.5:
            target[j, iy[0]:iy[1], ix[0]:ix[1]] = g[gy[0]:gy[1], gx[0]:gx[1]]
    return target, weight


def test_generate_target_matches_oracle():
    J = 17
    image_size, heatmap_size, sigma = (288, 384), (72, 96), 3
    joints = np.zeros((4, J, 3), np.float32)
    joints[..., :2] = RNG.rand(4, J, 2) * [400, 500] - 50  # include off-screen
    vis = (RNG.rand(4, J, 3) > 0.3).astype(np.float32)
    got_t, got_w = generate_target(jnp.array(joints), jnp.array(vis),
                                   image_size, heatmap_size, sigma)
    got_t, got_w = np.asarray(got_t), np.asarray(got_w)
    for b in range(4):
        want_t, want_w = _oracle_target(joints[b], vis[b], image_size, heatmap_size, sigma)
        np.testing.assert_allclose(got_w[b], want_w)
        np.testing.assert_allclose(got_t[b], want_t, atol=1e-5)


# ---------------------------------------------------------------- condition renders

def _oracle_blur_norm(hm):
    hm = cv2.GaussianBlur(hm, (15, 15), 0)
    am = np.max(hm)
    return hm if am == 0 else hm / (am / 255)


def test_render_condition_colored_matches_oracle():
    H, W, J = 96, 72, 17
    colors = np.stack([np.arange(J) * 10 % 255, np.arange(J) * 37 % 255,
                       np.arange(J) * 91 % 255], -1).astype(np.float64)
    kpts = (RNG.rand(2, J, 2) * [W + 20, H + 20] - 10)
    got = np.asarray(render_condition_colored(jnp.array(kpts), colors, (H, W)))
    for b in range(2):
        canvas = np.zeros((H, W, 3))
        for color, kpt in zip(colors, kpts[b].astype(int)):
            if 0 < kpt[0] < W and 0 < kpt[1] < H:
                canvas[kpt[1] - 1, kpt[0] - 1] = color
        want = _oracle_blur_norm(canvas)
        np.testing.assert_allclose(got[b], want, atol=5e-3)


def test_render_condition_stacked_matches_oracle():
    H, W, J = 64, 48, 5
    kpts = (RNG.rand(1, J, 2) * [W, H])
    got = np.asarray(render_condition_stacked(jnp.array(kpts), (H, W)))
    assert got.shape == (1, H, W, J)
    for j in range(J):
        canvas = np.zeros((H, W))
        kpt = kpts[0, j].astype(int)
        if 0 < kpt[0] < W and 0 < kpt[1] < H:
            canvas[kpt[1] - 1, kpt[0] - 1] = 255
        want = _oracle_blur_norm(canvas)
        np.testing.assert_allclose(got[0, :, :, j], want, atol=5e-3)


def test_render_condition_plain_matches_oracle():
    H, W, J = 64, 48, 17
    kpts = (RNG.rand(1, J, 2) * [W, H])
    got = np.asarray(render_condition_plain(jnp.array(kpts), (H, W)))
    assert got.shape == (1, H, W, 3)
    canvas = np.zeros((H, W))
    for kpt in kpts[0].astype(int):
        if 0 < kpt[0] < W and 0 < kpt[1] < H:
            canvas[kpt[1] - 1, kpt[0] - 1] = 255
    want = _oracle_blur_norm(canvas).astype(int)
    np.testing.assert_allclose(got[0, :, :, 0], want, atol=1)
    np.testing.assert_array_equal(got[0, :, :, 0], got[0, :, :, 2])


def test_render_all_zero_condition_is_zero():
    got = np.asarray(render_condition_colored(jnp.zeros((1, 17, 2)),
                                              np.ones((17, 3)), (64, 48)))
    assert np.all(got == 0)


# ---------------------------------------------------------------- decode

def _oracle_max_preds(hm):
    B, J, h, w = hm.shape
    flat = hm.reshape(B, J, -1)
    idx = np.argmax(flat, 2)
    mx = np.max(flat, 2)
    preds = np.stack([idx % w, idx // w], -1).astype(np.float32)
    preds *= (mx > 0)[..., None]
    return preds, mx[..., None]


def test_get_max_preds():
    hm = RNG.rand(3, 17, 96, 72).astype(np.float32)
    hm[0, 0] = -1.0  # all-negative map -> zeroed pred
    got_p, got_v = map(np.asarray, get_max_preds(jnp.array(hm)))
    want_p, want_v = _oracle_max_preds(hm)
    np.testing.assert_allclose(got_p, want_p)
    np.testing.assert_allclose(got_v, want_v, rtol=1e-6)
    assert np.all(got_p[0, 0] == 0)


def test_post_process_nudge_matches_oracle():
    import math
    hm = RNG.rand(2, 6, 64, 48).astype(np.float32)
    coords, _ = _oracle_max_preds(hm)
    got = np.asarray(post_process_nudge(jnp.array(hm), jnp.array(coords)))
    want = coords.copy()
    for n in range(2):
        for p in range(6):
            px = int(math.floor(coords[n, p, 0] + 0.5))
            py = int(math.floor(coords[n, p, 1] + 0.5))
            if 1 < px < 48 - 1 and 1 < py < 64 - 1:
                diff = np.array([hm[n, p, py, px + 1] - hm[n, p, py, px - 1],
                                 hm[n, p, py + 1, px] - hm[n, p, py - 1, px]])
                want[n, p] += np.sign(diff) * 0.25
    np.testing.assert_allclose(got, want)


def _oracle_dark_blur(hm, kernel=11):
    hm = hm.copy()
    border = (kernel - 1) // 2
    B, J, h, w = hm.shape
    for i in range(B):
        for j in range(J):
            om = np.max(hm[i, j])
            dr = np.zeros((h + 2 * border, w + 2 * border))
            dr[border:-border, border:-border] = hm[i, j]
            dr = cv2.GaussianBlur(dr, (kernel, kernel), 0)
            hm[i, j] = dr[border:-border, border:-border]
            hm[i, j] *= om / np.max(hm[i, j])
    return hm


def test_dark_blur_matches_oracle():
    hm = RNG.rand(2, 4, 32, 24).astype(np.float64)
    want = _oracle_dark_blur(hm)
    got = np.asarray(dark_blur(jnp.array(hm.astype(np.float32))))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_dark_refine_matches_oracle():
    # smooth unimodal map -> taylor step moves toward true subpixel peak
    h, w = 48, 36
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    hm = np.exp(-((xs - 17.3) ** 2 + (ys - 25.8) ** 2) / (2 * 2.0**2))[None, None]
    hm = hm.astype(np.float32)
    coords, _ = _oracle_max_preds(hm)
    got = np.asarray(dark_refine(jnp.array(hm), jnp.array(coords)))[0, 0]

    # oracle: blur, log, 2x2 newton (inference.py:90-109)
    hmo = _oracle_dark_blur(hm.astype(np.float64).copy())
    hmo = np.log(np.maximum(hmo, 1e-10))[0, 0]
    px, py = int(coords[0, 0, 0]), int(coords[0, 0, 1])
    dx = 0.5 * (hmo[py, px + 1] - hmo[py, px - 1])
    dy = 0.5 * (hmo[py + 1, px] - hmo[py - 1, px])
    dxx = 0.25 * (hmo[py, px + 2] - 2 * hmo[py, px] + hmo[py, px - 2])
    dxy = 0.25 * (hmo[py + 1, px + 1] - hmo[py - 1, px + 1] - hmo[py + 1, px - 1] + hmo[py - 1, px - 1])
    dyy = 0.25 * (hmo[py + 2, px] - 2 * hmo[py, px] + hmo[py - 2, px])
    H_ = np.array([[dxx, dxy], [dxy, dyy]])
    off = -np.linalg.inv(H_) @ np.array([dx, dy])
    want = coords[0, 0] + off
    np.testing.assert_allclose(got, want, atol=2e-3)
    # the refined point should be near the true subpixel peak
    np.testing.assert_allclose(got, [17.3, 25.8], atol=0.1)


def test_get_final_preds_end_to_end():
    B, J, h, w = 2, 17, 96, 72
    hm = RNG.rand(B, J, h, w).astype(np.float32)
    center = RNG.rand(B, 2).astype(np.float32) * 300 + 100
    scale = (RNG.rand(B, 2).astype(np.float32) + 0.5)
    preds, maxvals = get_final_preds(jnp.array(hm), jnp.array(center), jnp.array(scale),
                                     (w, h), post_process=True, use_dark=False)
    preds = np.asarray(preds)

    from buctd_tpu.geometry import transform_preds
    coords, want_v = _oracle_max_preds(hm)
    coords = np.asarray(post_process_nudge(jnp.array(hm), jnp.array(coords)))
    for b in range(B):
        want = transform_preds(np.concatenate([coords[b], np.zeros((J, 1))], 1),
                               center[b], scale[b], (w, h))[:, :2]
        np.testing.assert_allclose(preds[b], want, rtol=1e-4, atol=5e-3)


def test_rotated_warp_variants_vs_cv2():
    """Shear (axis-gather) and banded-matmul rotated warps vs cv2: exact at
    rot 0/90, small parallelogram-footprint deviation at intermediate angles."""
    import cv2
    from buctd_tpu.geometry import make_affine
    from buctd_tpu.ops import warp_affine_rotated, warp_affine_shear

    rng = np.random.RandomState(0)
    img = cv2.GaussianBlur(rng.rand(160, 140, 3).astype(np.float32), (0, 0), 1.5)
    c, s = np.array([70.0, 80.0]), np.array([0.6, 0.7])
    for rot in (0.0, -30.0, 45.0, 60.0, 90.0):
        t_inv = make_affine(c, s, rot, (96, 128), inv=True)[None]
        want = cv2.warpAffine(img, make_affine(c, s, rot, (96, 128)), (96, 128))
        for fn in (warp_affine_rotated, warp_affine_shear):
            got = np.asarray(fn(jnp.array(img[None]), jnp.array(t_inv), (128, 96)))[0]
            tol = 1e-4 if rot in (0.0, 90.0) else 0.2
            assert np.abs(got - want).max() < tol, (fn.__name__, rot)
            if rot not in (0.0, 90.0):
                assert np.abs(got - want).mean() < 5e-3, (fn.__name__, rot)


def test_crop_images_rotated_path():
    from buctd_tpu.ops import crop_images
    rng = np.random.RandomState(1)
    imgs = jnp.array(rng.rand(3, 100, 120, 3).astype(np.float32))
    c = jnp.array(rng.rand(3, 2) * 40 + 40)
    s = jnp.array(np.full((3, 2), 0.5))
    rots = jnp.array([0.0, 25.0, -80.0])
    out = np.asarray(crop_images(imgs, c, s, rots, (64, 80)))
    assert out.shape == (3, 80, 64, 3)
    assert np.isfinite(out).all() and out.max() > 0


def test_mapped_attention_exact():
    """The mapped-GEMM eval attention (models/attention.py _attend) equals the
    dense batched reference computation."""
    from buctd_tpu.models.attention import _attend
    rng = np.random.RandomState(0)
    B, h, nq, nk, d = 2, 2, 37, 53, 8
    q = jnp.array(rng.randn(B, h, nq, d).astype(np.float32))
    k = jnp.array(rng.randn(B, h, nk, d).astype(np.float32))
    v = jnp.array(rng.randn(B, h, nk, d).astype(np.float32))
    att = np.asarray(jnp.einsum("bhqd,bhkd->bhqk", q, k)) * 0.35
    att = np.exp(att - att.max(-1, keepdims=True))
    att /= att.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", att, np.asarray(v))
    got = np.asarray(_attend(q, k, v, 0.35))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_train_attention_mapped():
    """_attend_train: dropout=0 equals the eval path; dropout>0 is deterministic
    per key, zeroes entries, and has finite grads through the checkpointed map."""
    import jax

    from buctd_tpu.models.attention import _attend, _attend_train
    rng = np.random.RandomState(1)
    B, h, n, d = 2, 2, 24, 8
    q = jnp.array(rng.randn(B, h, n, d).astype(np.float32))
    k = jnp.array(rng.randn(B, h, n, d).astype(np.float32))
    v = jnp.array(rng.randn(B, h, n, d).astype(np.float32))
    key = jax.random.PRNGKey(0)
    np.testing.assert_allclose(np.asarray(_attend_train(q, k, v, 0.5, 0.0, key)),
                               np.asarray(_attend(q, k, v, 0.5)), atol=1e-6)
    a1 = np.asarray(_attend_train(q, k, v, 0.5, 0.3, key))
    a2 = np.asarray(_attend_train(q, k, v, 0.5, 0.3, key))
    np.testing.assert_array_equal(a1, a2)
    assert not np.allclose(a1, np.asarray(_attend(q, k, v, 0.5)))

    g = jax.grad(lambda q: jnp.sum(_attend_train(q, k, v, 0.5, 0.3, key) ** 2))(q)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_warp_engine_dispatch():
    """TPU.WARP_ENGINE knob: 'matmul' routes to the banded-matmul engine;
    unknown names fail loudly."""
    from buctd_tpu.geometry import make_affine
    from buctd_tpu.ops import warp_affine_rotated
    from buctd_tpu.ops.warp import warp_affine_general

    rng = np.random.RandomState(2)
    img = jnp.array(rng.rand(1, 64, 64, 3).astype(np.float32))
    t = jnp.array(make_affine(np.array([32.0, 32.0]), np.array([0.3, 0.3]),
                              20.0, (32, 32), inv=True)[None])
    want = np.asarray(warp_affine_rotated(img, t, (32, 32)))
    got = np.asarray(warp_affine_general(img, t, (32, 32), engine="matmul"))
    np.testing.assert_array_equal(got, want)
    # 'auto' resolves to matmul on CPU (pallas needs a real TPU)
    got_auto = np.asarray(warp_affine_general(img, t, (32, 32), engine="auto"))
    np.testing.assert_array_equal(got_auto, want)
    with pytest.raises(ValueError):
        warp_affine_general(img, t, (32, 32), engine="nope")


def test_pallas_warp_matches_matmul_engine():
    """Pallas rotated-warp kernel (interpret mode on CPU) vs the banded-matmul
    engine: identical two-pass semantics."""
    import jax.experimental.pallas as pl
    from buctd_tpu.geometry import make_affine
    from buctd_tpu.ops import warp_affine_rotated

    orig = pl.pallas_call
    pl.pallas_call = lambda *a, **k: orig(*a, interpret=True, **k)
    try:
        import importlib

        import buctd_tpu.ops.pallas_warp as pw
        importlib.reload(pw)
        rng = np.random.RandomState(0)
        img = rng.rand(160, 140, 3).astype(np.float32)
        c, s = np.array([70.0, 80.0]), np.array([0.6, 0.7])
        for rot in (0.0, 30.0, -60.0, 90.0):
            t_inv = make_affine(c, s, rot, (96, 128), inv=True)[None]
            want = np.asarray(warp_affine_rotated(jnp.array(img[None]),
                                                  jnp.array(t_inv), (128, 96)))[0]
            got = np.asarray(pw.warp_affine_pallas(jnp.array(img[None]),
                                                   jnp.array(t_inv), (128, 96)))[0]
            assert np.abs(got - want).max() < 1e-4, rot
    finally:
        pl.pallas_call = orig
        importlib.reload(pw)
