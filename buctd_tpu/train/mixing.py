"""On-device cutmix / mixup batch construction (reference lib/core/train.py:179-343).

The reference's ``train_cutmix`` / ``train_mixup`` consume a loader that yields
pre-mixed 7-tuples ``(input, target_f, tw_f, meta_f, target_b, tw_b, meta_b)`` built
by a MIPNet-era dataset that is NOT part of the reference repo — only the loss
semantics survive there: ``loss = crit(out, target_f, tw_f*λ_f) + crit(out, target_b,
tw_b*λ_b)`` with a scalar λ per sample (train.py:205-214, 305-314).

Here the mixing itself is a single jittable, on-device transform (no host work, no
extra transfer): the "background" sample is the batch rolled by one along the batch
axis, λ is drawn per sample from Beta(α, α), and the input is either

  * **mixup**:  ``x = λ·x_f + (1-λ)·x_b``  (blend, all channels incl. condition), or
  * **cutmix**: a random box with area fraction ``1-λ`` of the background pasted into
    the foreground at the same location (the standard CutMix formulation), with λ
    re-adjusted to the actual clipped pixel ratio so the loss weights stay exact.

Targets are NOT spliced — exactly like the reference loss, each branch sees the full
per-sample heatmap target weighted only by its scalar λ (train.py:206-211).

Under a data-sharded mesh the roll's shard-boundary row moves via an XLA collective
permute over ICI; everything else is local.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pair(batch):
    """Foreground = batch, background = batch rolled by one (pairs i with i-1)."""
    roll = lambda a: jnp.roll(a, 1, axis=0)
    return {
        "target_f": batch["target"],
        "target_weight_f": batch["target_weight"],
        "target_b": roll(batch["target"]),
        "target_weight_b": roll(batch["target_weight"]),
    }, roll(batch["input"])


def mixup_batch(rng, batch, alpha: float = 1.0):
    """Blend each sample with its rolled neighbour; λ ~ Beta(α, α) per sample.

    Returns the double-target batch consumed by ``make_train_step_double`` /
    ``make_train_step_mixed`` (keys: input, target_f/b, target_weight_f/b,
    lambda_f/b).
    """
    x_f = batch["input"]
    B = x_f.shape[0]
    out, x_b = _pair(batch)
    lam = jax.random.beta(rng, alpha, alpha, (B,)).astype(x_f.dtype)
    out["input"] = (lam[:, None, None, None] * x_f
                    + (1.0 - lam)[:, None, None, None] * x_b)
    out["lambda_f"], out["lambda_b"] = lam, 1.0 - lam
    return out


def cutmix_batch(rng, batch, alpha: float = 1.0):
    """Paste a random (1-λ)-area box of the rolled neighbour into each sample.

    Standard CutMix box: center uniform over the image, side lengths
    ``W·sqrt(1-λ), H·sqrt(1-λ)``, clipped to bounds; λ is then recomputed as the
    exact kept-pixel fraction so ``λ_f + λ_b = 1`` holds for the loss weights.
    """
    x_f = batch["input"]
    B, H, W = x_f.shape[0], x_f.shape[1], x_f.shape[2]
    out, x_b = _pair(batch)
    k_lam, k_cx, k_cy = jax.random.split(rng, 3)
    lam = jax.random.beta(k_lam, alpha, alpha, (B,))
    cut = jnp.sqrt(1.0 - lam)
    cw, ch = (W * cut) / 2.0, (H * cut) / 2.0
    cx = jax.random.uniform(k_cx, (B,)) * W
    cy = jax.random.uniform(k_cy, (B,)) * H
    x0 = jnp.clip(cx - cw, 0, W)
    x1 = jnp.clip(cx + cw, 0, W)
    y0 = jnp.clip(cy - ch, 0, H)
    y1 = jnp.clip(cy + ch, 0, H)
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    in_box = ((ys >= y0[:, None, None]) & (ys < y1[:, None, None])
              & (xs >= x0[:, None, None]) & (xs < x1[:, None, None]))
    out["input"] = jnp.where(in_box[..., None], x_b, x_f)
    lam_b = in_box.mean(axis=(1, 2)).astype(x_f.dtype)  # exact pasted fraction
    out["lambda_f"], out["lambda_b"] = 1.0 - lam_b, lam_b
    return out


def make_mix_fn(cfg):
    """Resolve cfg.TRAIN.MIX ('', 'cutmix', 'mixup') to a jittable mix(rng, batch).

    Returns None when mixing is off.  α comes from cfg.TRAIN.MIX_ALPHA.
    """
    mode = str(cfg.TRAIN.MIX).lower()
    if not mode:
        return None
    alpha = float(cfg.TRAIN.MIX_ALPHA)
    if mode == "mixup":
        return lambda rng, batch: mixup_batch(rng, batch, alpha)
    if mode == "cutmix":
        return lambda rng, batch: cutmix_batch(rng, batch, alpha)
    raise ValueError(f"unknown TRAIN.MIX {cfg.TRAIN.MIX!r} (want cutmix|mixup)")
