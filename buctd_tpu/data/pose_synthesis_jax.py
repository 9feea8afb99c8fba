"""On-device generative condition-noise sampler (jax) — SURVEY.md §7.3's plan.

Fixed-shape, jit/vmap formulation of data/pose_synthesis.py's rejection sampler
(itself a vectorized rewrite of the reference's per-joint loops,
lib/dataset/pose_synthesis.py:505-817).  The host engine costs ~97 ms/sample on
one core — the dominant cost of generative-sampling training (the headline
BUCTD config) on few-core hosts; this one runs the whole batch as one XLA
program in ~a millisecond.

Same distributions as the host engine, with two *statistically equivalent*
reformulations forced by static shapes:

  * candidate sets are fixed-size (N per (joint, mode, anchor)) with validity
    masks; "pick uniformly among kept" is a Gumbel-argmax over the mask;
  * the reference's miss-mode subsample ("non-gt anchors keep len//4 of 4N
    draws, then pick uniformly over the concatenation",
    pose_synthesis.py:631-641) becomes a two-stage pick: anchor ~
    categorical(kept_count x [4 if gt else 1]), then uniform within that
    anchor's kept set — identical anchor/sample marginals in expectation.

The anchor layout is fixed: [gt, swaps(P), inversion(1), swap-inversions(P)].
The reference's concatenated-index quirk — the "special" swap-mode slot is
1+len(swaps), which points at the FIRST SWAP-INV anchor when the inversion
anchor is absent (pose_synthesis.py:700-711) — is reproduced via a computed
special-slot index.  Parity with the host engine is locked distributionally in
tests/test_pose_synthesis.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .pose_synthesis import (COCO_SIGMAS, COCO_SYMMETRY, CROWDPOSE_SIGMAS,
                             CROWDPOSE_SYMMETRY, _coco_tables,
                             _crowdpose_tables, _generic_tables)

N = 500  # candidate samples per (joint, mode[, anchor]), as in the reference


class SynthSpec(NamedTuple):
    """Static per-dataset spec (all arrays are numpy, baked into the jit)."""

    sigmas: np.ndarray       # (J,)
    pair: np.ndarray         # (J,) int32, -1 = no symmetric pair
    jitter_v: np.ndarray     # (2, J)  [nv <= thr, nv > thr]
    miss_v: np.ndarray       # (3, J)  [nv <= t0, t0 < nv <= t1, nv > t1]
    inv_v: np.ndarray        # (J,)
    swap_v: np.ndarray       # (2, J)  [rule true, rule false]
    jitter_thr: int
    miss_thr: tuple
    swap_rule: tuple         # (t1, t2, t3): (nv<=t1 and no>0) or (nv<=t2 and no>=t3)


def make_spec(dataset: str, J: int) -> SynthSpec:
    if dataset == "coco":
        sig, sym, tab = COCO_SIGMAS, COCO_SYMMETRY, _coco_tables()
        jt, mt, sr = 10, (5, 10), (10, 15, 3)
        reps_j, reps_m = (1, 11), (1, 6, 11)
    elif dataset == "crowdpose":
        sig, sym, tab = CROWDPOSE_SIGMAS, CROWDPOSE_SYMMETRY, _crowdpose_tables()
        jt, mt, sr = 10, (5, 10), (10, 15, 3)
        reps_j, reps_m = (1, 11), (1, 6, 11)
    else:
        sig, sym, tab = np.full(J, 0.1), [], _generic_tables(J)
        jt, mt, sr = 4, (2, 4), (4, 5, 1)
        reps_j, reps_m = (1, 5), (1, 3, 5)
    pair = np.full(J, -1, np.int32)
    for q, w in sym:
        pair[q], pair[w] = w, q
    return SynthSpec(
        sigmas=np.asarray(sig, np.float32),
        pair=pair,
        jitter_v=np.stack([tab["jitter"](nv) for nv in reps_j]).astype(np.float32),
        miss_v=np.stack([tab["miss"](nv) for nv in reps_m]).astype(np.float32),
        inv_v=tab["inv"](1).astype(np.float32),
        swap_v=np.stack([tab["swap"](1, 1), tab["swap"](99, 0)]).astype(np.float32),
        jitter_thr=jt, miss_thr=mt, swap_rule=sr,
    )


def _masked_uniform_pick(key, pts, keep):
    """Uniform pick among kept rows of pts (N, 2); returns (xy (2,), found)."""
    g = jnp.where(keep, jax.random.uniform(key, keep.shape), -1.0)
    i = jnp.argmax(g)
    return pts[i], keep.any()


def _annulus(key, center, r_lo, r_hi, n):
    ka, kr = jax.random.split(key)
    ang = jax.random.uniform(ka, (n,), maxval=2 * jnp.pi)
    r = jax.random.uniform(kr, (n,), minval=r_lo, maxval=r_hi)
    pts = center[None, :] + r[:, None] * jnp.stack(
        [jnp.cos(ang), jnp.sin(ang)], axis=1)
    return pts, r


def _over(pts, anchors, avalid, exempt, radius):
    """keep mask (N,): every VALID, non-exempt anchor is farther than radius
    (scalar or (N,)) from each sample."""
    d = jnp.linalg.norm(pts[:, None, :] - anchors[None, :, :], axis=-1)  # (N, A)
    r = jnp.broadcast_to(jnp.asarray(radius, jnp.float32).reshape(-1, 1),
                         d.shape) if jnp.ndim(radius) else radius
    ok = (d > r) | ~avalid[None, :] | exempt[None, :]
    return ok.all(axis=1)


def _synthesize_one(key, joints, est, near, near_valid, area, num_overlap, spec):
    """One pose: joints/est (J, 3), near (P, J, 3), near_valid (P,) -> (J, 3)."""
    J = spec.sigmas.shape[0]
    P = near.shape[0]
    A = 2 * P + 2

    sigmas = jnp.asarray(spec.sigmas)
    pair = jnp.asarray(spec.pair)
    var = (sigmas * 2.0) ** 2
    ks10 = jnp.sqrt(-2.0 * area * var * np.log(0.10))
    ks50 = jnp.sqrt(-2.0 * area * var * np.log(0.50))
    ks85 = jnp.sqrt(-2.0 * area * var * np.log(0.85))

    vis = joints[:, 2] > 0
    synth0 = jnp.where(vis[:, None], joints, est)       # (J, 3)
    nv = vis.sum()

    # mode-probability tables (variant index from nv / num_overlap)
    jit_t = jnp.asarray(spec.jitter_v)[(nv > spec.jitter_thr).astype(jnp.int32)]
    m_idx = ((nv > spec.miss_thr[0]).astype(jnp.int32)
             + (nv > spec.miss_thr[1]).astype(jnp.int32))
    miss_t = jnp.asarray(spec.miss_v)[m_idx]
    inv_t = jnp.asarray(spec.inv_v)
    t1, t2, t3 = spec.swap_rule
    s_rule = ((nv <= t1) & (num_overlap > 0)) | ((nv <= t2) & (num_overlap >= t3))
    swap_t = jnp.asarray(spec.swap_v)[jnp.where(s_rule, 0, 1)]

    pair_c = jnp.maximum(pair, 0)                       # clipped for safe gather

    def per_joint(kj, j):
        gt = synth0[j, :2]
        pj = pair_c[j]
        has_pair = pair[j] >= 0
        inv_valid = has_pair & (joints[pj, 2] > 0)

        # fixed anchor layout [gt, swaps(P), inv, swap_inv(P)]
        swaps = near[:, j, :2]
        swap_m = near_valid & (near[:, j, 2] > 0)
        inv_a = synth0[pj, :2]
        swapinv = near[:, pj, :2]
        swapinv_m = has_pair & near_valid & (near[:, pj, 2] > 0)
        anchors = jnp.concatenate([gt[None], swaps, inv_a[None], swapinv])
        avalid = jnp.concatenate([jnp.array([True]), swap_m,
                                  inv_valid[None], swapinv_m])

        # the reference's "special" concatenated slot 1+len(swaps): the inversion
        # anchor when present, else the first valid swap-inv anchor, else none
        first_si = P + 2 + jnp.argmax(swapinv_m)
        special2 = jnp.where(inv_valid, P + 1,
                             jnp.where(swapinv_m.any(), first_si, A))
        slot = jnp.arange(A)
        ex_gt = slot == 0
        ex_sp2 = slot == special2

        k = jax.random.split(kj, 13)

        # jitter: annulus (ks85, ks50) of gt, per-sample-r rejection
        pts, r = _annulus(k[0], gt, ks85[j], ks50[j], N)
        keep = _over(pts, anchors, avalid, ex_gt, r)
        xy_j, f_j = _masked_uniform_pick(k[1], pts, keep)

        # miss: annulus (ks50, ks10) of EVERY anchor, fixed-ks50 rejection;
        # two-stage pick with gt-anchor weight x4 (see module docstring)
        amks = jax.random.split(k[2], A)

        def miss_anchor(ka, m):
            pts_m, _ = _annulus(ka, anchors[m], ks50[j], ks10[j], N)
            keep_m = avalid[m] & _over(pts_m, anchors, avalid, slot == m, ks50[j])
            return pts_m, keep_m

        pts_a, keep_a = jax.vmap(miss_anchor)(amks, slot)   # (A, N, 2), (A, N)
        w = keep_a.sum(1).astype(jnp.float32) * jnp.where(slot == 0, 4.0, 1.0)
        g = jnp.where(w > 0, jnp.log(jnp.maximum(w, 1e-9))
                      + jax.random.gumbel(k[3], (A,)), -jnp.inf)
        c = jnp.argmax(g)
        xy_m, _ = _masked_uniform_pick(k[4], pts_a[c], keep_a[c])
        f_m = (w > 0).any()

        # inversion: disk (0, ks50) of the pair anchor, per-sample-r rejection
        pts, r = _annulus(k[5], inv_a, 0.0, ks50[j], N)
        keep = inv_valid & _over(pts, anchors, avalid, ex_sp2, r)
        xy_i, f_i = _masked_uniform_pick(k[6], pts, keep)

        # swap: disks around the non-gt, non-special anchors; rejection tests
        # ONLY the gt and special slots (pose_synthesis.py:700-711); uniform
        # pick over the union = two-stage pick weighted by kept counts
        smks = jax.random.split(k[7], A)

        def swap_anchor(ka, m):
            pts_m, r_m = _annulus(ka, anchors[m], 0.0, ks50[j], N)
            ok = avalid[m] & (m != 0) & (m != special2)
            keep_m = ok & _over(pts_m, anchors, avalid, ~(ex_gt | ex_sp2), r_m)
            return pts_m, keep_m

        pts_s, keep_s = jax.vmap(swap_anchor)(smks, slot)
        ws = keep_s.sum(1).astype(jnp.float32)
        gs = jnp.where(ws > 0, jnp.log(jnp.maximum(ws, 1e-9))
                       + jax.random.gumbel(k[8], (A,)), -jnp.inf)
        cs = jnp.argmax(gs)
        xy_s, _ = _masked_uniform_pick(k[9], pts_s[cs], keep_s[cs])
        f_s = (ws > 0).any()

        # good: disk (0, ks85) of gt, N/4 samples, per-sample-r rejection
        pts, r = _annulus(k[10], gt, 0.0, ks85[j], N // 4)
        keep = _over(pts, anchors, avalid, ex_gt, r)
        xy_g, f_g = _masked_uniform_pick(k[11], pts, keep)

        cand = jnp.stack([xy_j, xy_m, xy_i, xy_s, xy_g])          # (5, 2)
        found = jnp.stack([f_j, f_m, f_i, f_s, f_g])
        base = jnp.stack([jit_t[j], miss_t[j], inv_t[j], swap_t[j],
                          1.0 - (jit_t[j] + miss_t[j] + inv_t[j] + swap_t[j])])
        p = base * found
        tot = p.sum()
        gmode = jnp.where(p > 0, jnp.log(jnp.maximum(p, 1e-12))
                          + jax.random.gumbel(k[12], (5,)), -jnp.inf)
        mode = jnp.argmax(gmode)
        out = jnp.concatenate([cand[mode], jnp.ones(1)])
        return jnp.where(tot > 0, out, jnp.zeros(3))

    keys = jax.random.split(key, J)
    return jax.vmap(per_joint)(keys, jnp.arange(J))


def synthesize_pose_batch(key, joints, est, near, near_valid, area, num_overlap,
                          spec: SynthSpec):
    """Batched device synthesis (jit the closure over ``spec`` — its numpy
    arrays become compile-time constants; see make_synthesize_fn).

    joints/est (B, J, 3), near (B, P, J, 3), near_valid (B, P), area (B,),
    num_overlap (B,) -> (B, J, 3).
    """
    B = joints.shape[0]
    keys = jax.random.split(key, B)
    return jax.vmap(_synthesize_one, in_axes=(0, 0, 0, 0, 0, 0, 0, None))(
        keys, joints.astype(jnp.float32), est.astype(jnp.float32),
        near.astype(jnp.float32), near_valid, area.astype(jnp.float32),
        num_overlap, spec)


def make_synthesize_fn(cfg, P_max: int = 8):
    """cfg -> fn(key, joints, est, near_list, area) with host-side padding.

    ``near_list`` is a python list of (P_i, J, 3) arrays (one per sample, as the
    db stores them); they are padded/truncated to P_max.  num_overlap is 0 in
    the training path (joints_dataset.py:204-207).  Returns a numpy (B, J, 3).
    """
    J = int(cfg.MODEL.NUM_JOINTS)
    spec = make_spec(cfg.DATASET.DATASET, J)
    jitted = jax.jit(functools.partial(synthesize_pose_batch, spec=spec))

    def fn(key, joints, est, near_list, area):
        B = len(joints)
        near = np.zeros((B, P_max, J, 3), np.float32)
        near_valid = np.zeros((B, P_max), bool)
        for i, nl in enumerate(near_list):
            nl = np.asarray(nl, np.float32).reshape(-1, J, 3)[:P_max]
            near[i, :len(nl)] = nl
            near_valid[i, :len(nl)] = True
        out = jitted(
            key, jnp.asarray(np.asarray(joints, np.float32)),
            jnp.asarray(np.asarray(est, np.float32)),
            jnp.asarray(near), jnp.asarray(near_valid),
            jnp.asarray(np.asarray(area, np.float32)),
            jnp.zeros(B, jnp.int32))
        return np.asarray(out)

    return fn
