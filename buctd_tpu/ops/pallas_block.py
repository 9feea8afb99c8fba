"""Pallas TPU kernel: fused HRNet basic block (eval mode).

One kernel computes  relu(conv3x3(relu(conv3x3(x) + b1)) + b2 + x)  with the
intermediate activation held in VMEM — the HBM traffic drops from ~5 full
activation tensors (what XLA's unfused pair pays: x in, y out+in, z
out + residual re-read) to one read of x and one write of the output.  BN is
assumed folded into weights/biases (eval mode — same regime as
models/fuse.py's stem fusion; reference block:
/root/reference/lib/models/pose_hrnet.py:64-92).

Formulation notes (three attempts, see PERF.md round-5 "fused basic block"):

* concat-im2col ((H*W, 9C) then one GEMM) dies in Mosaic for C not a
  multiple of 128: "result/input offset mismatch" on the lane-dim concat.
* per-tap zero-padding each slice to 128 lanes before the concat crashes
  the TPU compile helper outright.
* THIS version: the padded image lives in a VMEM scratch ref; each tap is a
  fresh *ref load* at static (dy, dx) offsets (clean layouts, offsets only
  on the second-minor dim), flattened to (H*W8, C) — W pads up to a sublane
  multiple W8 so the flatten is relayout-free — and contracted in 9
  accumulated GEMMs (K = C per tap, padded to 128 lanes by the MXU).

MXU padding cost of the 9-GEMM form vs the ideal K=9C im2col: none for
C=384 (lane-aligned), 1.33x for C=96/192, 2.67x for C=48 — so branch 0 is
expected to lose to XLA (it is lane-fill-bound there anyway) and the win, if
any, must come on branches 1-3 where tools/bench_block.py measures XLA at
2.3-2.5x above its structural bounds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _w8(w):
    return -(-w // 8) * 8


def _conv9(src_ref, wmat_ref, g, h, w8, c, dtype):
    """9 accumulated (G*H*W8, C)x(C, C) GEMMs over the tap offsets.

    src_ref: (G, H+2, W8+2, C) zero-padded activations in VMEM scratch —
    G images per grid instance keep the GEMM M dim large enough to hide MXU
    pipeline latency (one image per instance measured 0.6-0.9x XLA).
    wmat_ref: (9C, C) stacked tap weights (tap-major, (dy, dx) order).
    """
    acc = jnp.zeros((g * h * w8, c), jnp.float32)
    for t, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                 for dx in range(3)):
        tap = src_ref[:, pl.ds(dy, h), pl.ds(dx, w8), :].reshape(g * h * w8, c)
        wt = wmat_ref[pl.ds(t * c, c), :]
        acc += jnp.dot(tap.astype(dtype), wt,
                       preferred_element_type=jnp.float32)
    return acc


def _fold_weights(w):
    """HWIO (3, 3, C, C) -> (9C, C), tap-major rows matching `_conv9`."""
    return w.reshape(9 * w.shape[2], w.shape[3])


def _make_kernel(valid_w, g):
    """Bind the true image width (exact width-pad mask) and group size."""

    def kernel(x_ref, w1_ref, w2_ref, b1_ref, b2_ref, out_ref,
               xp_ref, yp_ref):
        h, w8, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
        dtype = x_ref.dtype
        x = x_ref[...]                                  # (G, H, W8, C)
        xp_ref[...] = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = _conv9(xp_ref, w1_ref, g, h, w8, c, dtype)
        y = jax.nn.relu(y + b1_ref[...].astype(jnp.float32))
        y = y.reshape(g, h, w8, c)
        if valid_w != w8:
            # re-zero the width-padding columns: conv1 turned them into
            # relu(bias) and conv2's taps at the right border must read zeros
            col = jax.lax.broadcasted_iota(jnp.int32, (g, h, w8, c), 2)
            y = jnp.where(col < valid_w, y, 0.0)
        yp_ref[...] = jnp.pad(y.astype(dtype), ((0, 0), (1, 1), (1, 1),
                                                (0, 0)))
        z = _conv9(yp_ref, w2_ref, g, h, w8, c, dtype)
        z = (z + b2_ref[...].astype(jnp.float32)
             + x.reshape(g * h * w8, c).astype(jnp.float32))
        out_ref[...] = jax.nn.relu(z).reshape(g, h, w8, c).astype(
            out_ref.dtype)

    return kernel


# images per grid instance, sized so G*H*W8 reaches MXU-efficient M while
# the two (G, H+2, W8+2, C) scratch buffers stay a few MB of VMEM
def _group(b, h, w8, c):
    target = 6144
    g = max(1, min(b, target // (h * w8)))
    while b % g:
        g -= 1
    return g


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_basic_block(x, w1, w2, b1, b2, interpret: bool = False):
    """x (B, H, W, C) + HWIO 3x3 weights/biases -> fused eval basic block."""
    b, h, w, c = x.shape
    w8 = _w8(w)
    if w8 != w:   # pad width to a sublane multiple; junk columns stay zero
        x = jnp.pad(x, ((0, 0), (0, 0), (0, w8 - w), (0, 0)))
    g = _group(b, h, w8, c)
    w1m, w2m = _fold_weights(w1), _fold_weights(w2)
    out = pl.pallas_call(
        _make_kernel(w, g),
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, h, w8, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9 * c, c), lambda i: (0, 0)),
            pl.BlockSpec((9 * c, c), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((g, h, w8, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w8, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((g, h + 2, w8 + 2, c), x.dtype),
            pltpu.VMEM((g, h + 2, w8 + 2, c), x.dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x, w1m, w2m, b1, b2)
    return out[:, :, :w, :] if w8 != w else out
