"""Pallas TPU kernel for the two-pass rotated warp (see ops/warp.py).

The banded-matmul engine (`_warp_two_pass_mm`) materializes (H, W, ow) weight
tensors in HBM (~300 MB/sample at 512^2).  This kernel builds the 2-tap banded
weights on the fly in VMEM and contracts them on the MXU, so HBM traffic drops to
one read of the source rows + one write of the output.

Both passes share one primitive: per-row 1-D resampling with a row-linear offset,
  out[r, o] = sum_w img[r, w] * relu(1 - |alpha*o + beta_c*r + beta_o - w|)
(pass 1: r = source row Y; pass 2 runs on the transposed intermediate with
r = output column).  The affine scalars are per-sample SMEM inputs.

Layout: images are processed as (R, C, W) so the wide W axis sits on the lanes;
R tiles by 8 (sublanes) and W / the output width are padded to multiples of 128
by the caller.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 8
COL_TILE = 128


def _resample_kernel(scal_ref, img_ref, out_ref):
    """img block (ROW_TILE, C, W) -> out block (ROW_TILE, C, COL_TILE).

    scal_ref (SMEM): [alpha, beta_c, beta_o] for this sample.
    """
    i = pl.program_id(0)            # row tile
    j = pl.program_id(1)            # output-column tile
    alpha = scal_ref[0]
    beta_c = scal_ref[1]
    beta_o = scal_ref[2]

    _, C, W = img_ref.shape
    # output columns covered by this tile (tpu.iota must be integer-typed)
    o = (j * COL_TILE
         + jax.lax.broadcasted_iota(jnp.int32, (1, COL_TILE), 1)).astype(jnp.float32)
    w = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0).astype(jnp.float32)

    for rr in range(ROW_TILE):
        r = i * ROW_TILE + rr
        u = alpha * o + beta_c * r + beta_o            # (1, COL_TILE)
        wts = jax.nn.relu(1.0 - jnp.abs(u - w))        # (W, COL_TILE), VMEM only
        out_ref[rr, :, :] = jnp.dot(img_ref[rr], wts,
                                    preferred_element_type=jnp.float32)


def _resample_rows(img_rcw, scalars, out_w: int):
    """img (R, C, W) f32, scalars (3,) f32 -> (R, C, out_w) f32.

    R % 8 == 0, W % 128 == 0, out_w % 128 == 0 (caller pads).
    """
    R, C, W = img_rcw.shape
    grid = (R // ROW_TILE, out_w // COL_TILE)
    return pl.pallas_call(
        _resample_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROW_TILE, C, W), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, C, COL_TILE), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C, out_w), jnp.float32),
    )(scalars, img_rcw)


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _two_pass_pallas(img, t, out_hw):
    """One sample: img (H, W, C) f32, t (2, 3) dst->src affine (|d| >= |b|)."""
    oh, ow = out_hw
    a, b, e = t[0, 0], t[0, 1], t[0, 2]
    c, d, f = t[1, 0], t[1, 1], t[1, 2]

    # pass 1 over source rows: u = (a - bc/d) * ox + (b/d) * Y + (e - (b/d) f)
    img_rcw = _pad_to(_pad_to(img.transpose(0, 2, 1), 0, ROW_TILE), 2, COL_TILE)
    s1 = jnp.stack([a - b * c / d, b / d, e - (b / d) * f])
    ow_pad = ow + ((-ow) % COL_TILE)
    i1 = _resample_rows(img_rcw, s1, ow_pad)           # (Hp, C, ow_pad)

    # pass 2 over output columns of the transposed intermediate:
    # v = d * oy + c * ox + f  (rows r = ox)
    i1_t = _pad_to(i1[:img.shape[0], :, :ow].transpose(2, 1, 0), 0, ROW_TILE)
    i1_t = _pad_to(i1_t, 2, COL_TILE)                  # (owp, C, Hp)
    s2 = jnp.stack([d, c, f])
    oh_pad = oh + ((-oh) % COL_TILE)
    out = _resample_rows(i1_t, s2, oh_pad)             # (owp, C, oh_pad)
    return out[:ow, :, :oh].transpose(2, 0, 1)         # (oh, ow, C)


def warp_affine_pallas(images: jnp.ndarray, trans_dst2src: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Batched general affine warp — pallas engine.

    Same semantics as ops.warp.warp_affine_rotated (two-pass bilinear, zero
    border, per-sample transposed decomposition for >45 deg rotations).
    """
    oh, ow = int(out_hw[0]), int(out_hw[1])
    t = trans_dst2src.astype(jnp.float32)

    def one(args):
        img, ti = args
        img = img.astype(jnp.float32)
        use_t = jnp.abs(ti[1, 1]) < jnp.abs(ti[0, 1])

        def guarded(tt):
            return tt.at[1, 1].set(jnp.where(jnp.abs(tt[1, 1]) < 1e-6,
                                             1e-6, tt[1, 1]))

        return jax.lax.cond(
            use_t,
            lambda: _two_pass_pallas(img.transpose(1, 0, 2),
                                     guarded(jnp.stack([ti[1], ti[0]])), (oh, ow)),
            lambda: _two_pass_pallas(img, guarded(ti), (oh, ow)))

    return jax.lax.map(one, (images, t))
