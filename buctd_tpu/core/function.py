"""Train / validate loops (reference: lib/core/function.py).

TPU-native restructuring: the whole per-batch eval protocol — forward, flip-test with
condition re-rendering, flip_back + 1-px shift + averaging, loss, PCK, decode
(nudge/DARK) and inverse-affine unprojection — is ONE jitted program; the host only
accumulates (N, J, 3) predictions and calls dataset.evaluate.  The reference does the
flip/decode on CPU numpy with per-pixel loops (function.py:213-273).
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import condition_mode, render_condition
from ..geometry import flip_pairs_to_perm
from ..ops import get_final_preds
from .loss import make_loss
from .metrics import pck_accuracy

logger = logging.getLogger(__name__)


class AverageMeter:
    """Running average (function.py:360-375)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = self.avg = self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count if self.count else 0.0


# validate() is called once per eval epoch / refine round; without this memo
# every call built a fresh closure -> fresh jax.jit object -> full RETRACE of
# the model (seconds per eval even with the persistent compile cache, which
# only skips the XLA compile, not tracing).  Keyed on everything the closure
# reads; values hold the model ref so id(model) stays valid.
_VSTEP_MEMO: dict = {}


def make_validate_step(cfg, model, flip_pairs, kpt_colors, mesh=None):
    key = (
        id(model), None if mesh is None else str(mesh),
        np.asarray(kpt_colors, np.float32).tobytes(),
        tuple(tuple(p) for p in flip_pairs),
        int(cfg.MODEL.NUM_JOINTS),
        tuple(cfg.MODEL.IMAGE_SIZE), tuple(cfg.MODEL.HEATMAP_SIZE),
        condition_mode(cfg), bool(cfg.MODEL.CONDITIONAL_TOPDOWN),
        bool(cfg.TEST.FLIP_TEST), bool(cfg.TEST.SHIFT_HEATMAP),
        bool(cfg.TEST.POST_PROCESS), bool(cfg.TEST.USE_DARK),
        str(cfg.LOSS),
    )
    hit = _VSTEP_MEMO.get(key)
    if hit is not None:
        return hit[0]
    step = _make_validate_step(cfg, model, flip_pairs, kpt_colors, mesh)
    _VSTEP_MEMO[key] = (step, model)   # keep model alive -> id can't be reused
    return step


def _make_validate_step(cfg, model, flip_pairs, kpt_colors, mesh=None):
    """One jitted eval step: (variables, batch) -> (preds, maxvals, loss, acc, cnt).

    Implements the full flip-test protocol (function.py:213-236):
      * colored condition: re-rendered on device from FLIPPED condition joints
        (the reference round-trips to host for this, transforms.py:33-47)
      * stacked condition: channel-swap + spatial flip of the rendered map
      * plain condition / RGB: spatial flip
      * model output: flip_back (W-flip + pair-swap), optional 1-px SHIFT_HEATMAP,
        average with the unflipped output
    """
    J = int(cfg.MODEL.NUM_JOINTS)
    perm = np.asarray(flip_pairs_to_perm(J, flip_pairs))
    img_w, img_h = int(cfg.MODEL.IMAGE_SIZE[0]), int(cfg.MODEL.IMAGE_SIZE[1])
    hm_w, hm_h = int(cfg.MODEL.HEATMAP_SIZE[0]), int(cfg.MODEL.HEATMAP_SIZE[1])
    mode = condition_mode(cfg)
    conditional = bool(cfg.MODEL.CONDITIONAL_TOPDOWN)
    flip_test = bool(cfg.TEST.FLIP_TEST)
    shift = bool(cfg.TEST.SHIFT_HEATMAP)
    post_process = bool(cfg.TEST.POST_PROCESS)
    use_dark = bool(cfg.TEST.USE_DARK)
    colors = np.asarray(kpt_colors, np.float32)
    loss_fn = make_loss(cfg)

    def step(variables, batch):
        x = batch["input"]
        B = x.shape[0]

        if flip_test:
            rgb_f = x[..., :3][:, :, ::-1, :]
            if conditional:
                if mode in ("colored", "plain"):
                    # fliplr_joints returns joints * joints_vis (transforms.py:61-75):
                    # invisible cond joints are zeroed before the flipped re-render.
                    # NB reference quirk: flip_hm dispatches on channel count
                    # (transforms.py:37), so a PLAIN condition (3 channels via
                    # np.repeat) is re-rendered as COLORED for the flipped branch,
                    # not mirrored — reproduced on purpose.
                    cj = batch["cond_joints"]
                    cv = batch["cond_joints_vis"][:, perm]
                    cjf = cj.at[..., 0].set(img_w - cj[..., 0] - 1)[:, perm] * cv
                    cond_f = render_condition(cjf, "colored", (img_h, img_w), colors)
                else:  # stacked: channel-swap + spatial flip of the rendered map
                    cond_f = x[..., 3:][:, :, ::-1, :][..., perm]
                xf = jnp.concatenate([rgb_f, cond_f], axis=-1)
            else:
                xf = rgb_f
            # one 2B forward instead of two B forwards: ~25% better MXU fill
            out_all = model.apply(variables, jnp.concatenate([x, xf], 0),
                                  train=False)
            out, out_f = out_all[:B], out_all[B:]
            out_f = out_f[:, :, ::-1, :][..., perm]            # flip_back, NHWC
            if shift:
                out_f = out_f.at[:, :, 1:, :].set(out_f[:, :, :-1, :])
            out = (out + out_f) * 0.5
        else:
            out = model.apply(variables, x, train=False)       # (B, h, w, J)

        loss = loss_fn(out, batch["target"], batch["target_weight"])
        out_jchw = out.transpose(0, 3, 1, 2)
        acc, cnt, _ = pck_accuracy(out_jchw, batch["target"].transpose(0, 3, 1, 2))
        preds, maxvals = get_final_preds(out_jchw, batch["center"], batch["scale"],
                                         (hm_w, hm_h), post_process=post_process,
                                         use_dark=use_dark)
        return preds, maxvals, loss, acc, cnt, out

    if mesh is None:
        return jax.jit(step)
    from ..parallel.mesh import data_sharding, replicated_sharding
    repl, data = replicated_sharding(mesh), data_sharding(mesh)
    return jax.jit(step, in_shardings=(repl, data),
                   out_shardings=(data, data, repl, repl, repl, data))


def validate(cfg, val_loader, val_dataset, model, variables, output_dir,
             epoch=-1, mesh=None, writer=None, print_prefix=""):
    """Full evaluation: loop -> accumulate -> dataset.evaluate (function.py:178-336).

    Multi-host: each process decodes only its own contiguous shard of the val set
    (the loaders serve per-process rows of the global batch), then the per-process
    prediction blocks are all-gathered over DCN and every process runs the
    identical dataset.evaluate on the merged set.
    """
    import jax as _jax

    from ..data.pipeline import shard_length
    from ..parallel.mesh import host_local_rows

    batch_time, losses, acc = AverageMeter(), AverageMeter(), AverageMeter()
    step = make_validate_step(cfg, model, val_dataset.flip_pairs,
                              val_dataset.kpt_colors, mesh=mesh)

    num_samples = shard_length(len(val_dataset))   # this process's shard capacity
    all_preds = np.zeros((num_samples, int(cfg.MODEL.NUM_JOINTS), 3), np.float32)
    all_boxes = np.zeros((num_samples, 7))
    all_db_idx = np.zeros((num_samples,), np.int64)  # global db row per pred
    image_path = []
    idx = 0
    end = time.time()

    def _stage(batch):
        dev_batch = {k: batch[k] for k in
                     ("input", "target", "target_weight", "center", "scale",
                      "cond_joints", "cond_joints_vis")}
        if mesh is not None:
            from ..parallel.mesh import shard_batch
            dev_batch = shard_batch(dev_batch, mesh)
        return batch, dev_batch

    from ..utils.prefetch import prefetch

    # stage (host decode/preprocess + device transfer) batch i+1 while the
    # device runs step i — this loop fetches loss/acc every step, so without
    # prefetch the device idles through every batch's input work
    for i, (batch, dev_batch) in enumerate(prefetch(
            val_loader, _stage, int(getattr(cfg.TPU, "PREFETCH", 2)))):
        preds, maxvals, loss, a, cnt, out_hm = step(variables, dev_batch)
        preds, maxvals = host_local_rows(preds), host_local_rows(maxvals)

        n = int(batch["valid"].sum())
        losses.update(float(loss), n)
        acc.update(float(a), int(cnt))

        c, s = batch["center"], batch["scale"]
        all_preds[idx:idx + n, :, 0:2] = preds[:n, :, 0:2]
        all_preds[idx:idx + n, :, 2:3] = maxvals[:n]
        all_boxes[idx:idx + n, 0:2] = c[:n, 0:2]
        all_boxes[idx:idx + n, 2:4] = s[:n, 0:2]
        all_boxes[idx:idx + n, 4] = np.prod(s[:n] * 200, 1)
        all_boxes[idx:idx + n, 5] = batch["score"][:n]
        all_boxes[idx:idx + n, 6] = batch["annotation_id"][:n]
        all_db_idx[idx:idx + n] = batch["db_index"][:n]
        image_path.extend(batch["image_path"][:n])
        idx += n

        batch_time.update(time.time() - end)
        end = time.time()
        if i % cfg.PRINT_FREQ == 0 or i == len(val_loader) - 1:
            logger.info(
                "Test: [%d/%d]\tTime %.3f (%.3f)\tLoss %.6f (%.6f)\t"
                "Accuracy %.3f (%.3f)", i, len(val_loader) - 1, batch_time.val,
                batch_time.avg, losses.val, losses.avg, acc.val, acc.avg)
            if cfg.DEBUG.DEBUG:
                import os as _os

                from ..ops import get_max_preds
                from ..utils.vis import save_debug_images
                hm = host_local_rows(out_hm)
                hm_pred, _ = get_max_preds(hm.transpose(0, 3, 1, 2))
                stride = cfg.MODEL.IMAGE_SIZE[0] / cfg.MODEL.HEATMAP_SIZE[0]
                # per-process filename tag: every host dumps ITS shard; one
                # shared prefix would clobber on a shared filesystem
                ptag = (f"_proc{_jax.process_index()}"
                        if _jax.process_count() > 1 else "")
                prefix = _os.path.join(
                    output_dir,
                    f"val_epoch_{epoch:09d}_iter_{i}{print_prefix}{ptag}")
                save_debug_images(cfg, batch["input"], batch,
                                  np.asarray(batch["target"]),
                                  np.asarray(hm_pred) * stride, hm, prefix)

    if _jax.process_count() > 1:
        # Merge the per-process shards into the full prediction set on every
        # host (parallel/mesh.py dcn_merge_rows holds the int32 id-split and
        # db-index invariants).  Image paths are rebuilt from the (identical,
        # fully-loaded) db on each host via the GATHERED per-row db indices
        # instead of gathering strings — structurally correct for any eval
        # order, shuffled or not.
        from ..parallel.mesh import dcn_merge_rows
        all_preds, all_boxes, db_idx_g, idx = dcn_merge_rows(
            all_preds, all_boxes, all_db_idx, idx, num_samples)
        image_path = [val_dataset.db[int(j)]["image"] for j in db_idx_g]
        if _jax.process_index() > 0:
            # every host runs the identical evaluate; secondary processes write
            # their copies under a per-process subdir so a SHARED filesystem
            # never sees concurrent writes to the same results file
            import os as _os
            output_dir = _os.path.join(output_dir,
                                       f"proc{_jax.process_index()}")

    name_values, perf = val_dataset.evaluate(
        cfg, all_preds[:idx], output_dir, all_boxes[:idx], image_path, epoch)
    if writer is not None:
        writer.add_scalar("valid_loss", losses.avg)
        writer.add_scalar("valid_acc", acc.avg)
        if isinstance(name_values, dict):
            for k, v in name_values.items():
                writer.add_scalar(f"valid_{k}", v)
    _print_name_value(name_values, type(model).__name__)
    return name_values, perf


def make_validate_lambda_step(cfg, model, flip_pairs, mesh=None, use_lambda=True):
    """One jitted λ-conditioned eval step (legacy lib/core/validate.py:199-229).

    Differences from the active protocol on purpose: the legacy loop flips the
    WHOLE input spatially (``input.flip(3)``, validate.py:210) — it predates
    flip_hm, so the condition channels are mirrored, never re-rendered.

    use_lambda=False skips the model's λ head (for checkpoints without one —
    every model actually IN the reference repo ignores λ; only the score
    bookkeeping differs between the two passes then).
    """
    J = int(cfg.MODEL.NUM_JOINTS)
    perm = np.asarray(flip_pairs_to_perm(J, flip_pairs))
    hm_w, hm_h = int(cfg.MODEL.HEATMAP_SIZE[0]), int(cfg.MODEL.HEATMAP_SIZE[1])
    flip_test = bool(cfg.TEST.FLIP_TEST)
    shift = bool(cfg.TEST.SHIFT_HEATMAP)
    post_process = bool(cfg.TEST.POST_PROCESS)
    use_dark = bool(cfg.TEST.USE_DARK)
    loss_fn = make_loss(cfg)

    def apply(variables, x, lambda_vec):
        if use_lambda:
            return model.apply(variables, x, train=False, lambda_vec=lambda_vec)
        return model.apply(variables, x, train=False)

    def step(variables, batch, lambda_vec):
        x = batch["input"]
        B = x.shape[0]
        if flip_test:
            xf = x[:, :, ::-1, :]            # plain flip, cond channels included
            out_all = apply(variables, jnp.concatenate([x, xf], 0),
                            jnp.concatenate([lambda_vec] * 2, 0))
            out, out_f = out_all[:B], out_all[B:]
            out_f = out_f[:, :, ::-1, :][..., perm]            # flip_back
            if shift:
                out_f = out_f.at[:, :, 1:, :].set(out_f[:, :, :-1, :])
            out = (out + out_f) * 0.5
        else:
            out = apply(variables, x, lambda_vec)
        loss = loss_fn(out, batch["target"], batch["target_weight"])
        out_jchw = out.transpose(0, 3, 1, 2)
        acc, cnt, _ = pck_accuracy(out_jchw, batch["target"].transpose(0, 3, 1, 2))
        preds, maxvals = get_final_preds(out_jchw, batch["center"], batch["scale"],
                                         (hm_w, hm_h), post_process=post_process,
                                         use_dark=use_dark)
        return preds, maxvals, loss, acc, cnt

    if mesh is None:
        return jax.jit(step)
    from ..parallel.mesh import data_sharding, replicated_sharding
    repl, data = replicated_sharding(mesh), data_sharding(mesh)
    return jax.jit(step, in_shardings=(repl, data, data),
                   out_shardings=(data, data, repl, repl, repl))


def validate_lambda_quantitative(cfg, val_loader, val_dataset, model, variables,
                                 output_dir, epoch=-1, mesh=None, writer=None,
                                 print_prefix="", lambda_vals=(0, 1)):
    """λ-sweep evaluation (lib/core/validate.py:175-333): every batch is evaluated
    once per λ with lambda_vec = [λ, 1-λ]; λ=0 scores decay by TEST.DECAY_THRE
    (:245-250); all_boxes grows an 8th column carrying λ (:263) so
    dataset.evaluate dispatches to the per-mode + oks_merge evaluation.

    Multi-host: same DCN merge as validate() — each process sweeps its own
    loader shard, the per-process (preds, boxes-with-λ, db-index) blocks are
    all-gathered, and every host runs the identical evaluate (secondary hosts
    under proc{q}/ subdirs)."""
    from ..data.pipeline import shard_length

    losses, acc = AverageMeter(), AverageMeter()
    use_lambda = "lambda_fc" in variables.get("params", {})
    step = make_validate_lambda_step(cfg, model, val_dataset.flip_pairs, mesh=mesh,
                                     use_lambda=use_lambda)

    lambda_vals = list(lambda_vals)
    num_samples = len(lambda_vals) * shard_length(len(val_dataset))
    all_preds = np.zeros((num_samples, int(cfg.MODEL.NUM_JOINTS), 3), np.float32)
    all_boxes = np.zeros((num_samples, 8))
    all_db_idx = np.zeros((num_samples,), np.int64)
    image_path = []
    idx = 0

    def _stage(batch):
        dev_batch = {k: batch[k] for k in
                     ("input", "target", "target_weight", "center", "scale")}
        if mesh is not None:
            from ..parallel.mesh import shard_batch
            dev_batch = shard_batch(dev_batch, mesh)
        return batch, dev_batch

    from ..utils.prefetch import prefetch

    for i, (batch, dev_batch) in enumerate(prefetch(
            val_loader, _stage, int(getattr(cfg.TPU, "PREFETCH", 2)))):
        B = batch["input"].shape[0]
        n = int(batch["valid"].sum())
        for lam in lambda_vals:
            # B is the process-LOCAL row count; under a mesh the step's
            # lambda_vec is data-sharded like the rest of the batch, so it must
            # ride the same process-local -> global assembly as dev_batch
            lv = np.concatenate(
                [np.full((B, 1), float(lam), np.float32),
                 np.full((B, 1), 1.0 - float(lam), np.float32)], axis=1)
            if mesh is not None:
                from ..parallel.mesh import shard_batch
                lambda_vec = shard_batch(lv, mesh)
            else:
                lambda_vec = jnp.asarray(lv)
            preds, maxvals, loss, a, cnt = step(variables, dev_batch, lambda_vec)
            from ..parallel.mesh import host_local_rows
            preds, maxvals = host_local_rows(preds), host_local_rows(maxvals)
            losses.update(float(loss), n)
            acc.update(float(a), int(cnt))

            # λ=0 predictions keep a decayed box score (validate.py:245-250)
            score = batch["score"][:n] * (cfg.TEST.DECAY_THRE if lam == 0 else 1.0)
            c, s = batch["center"], batch["scale"]
            all_preds[idx:idx + n, :, 0:2] = preds[:n, :, 0:2]
            all_preds[idx:idx + n, :, 2:3] = maxvals[:n]
            all_boxes[idx:idx + n, 0:2] = c[:n, 0:2]
            all_boxes[idx:idx + n, 2:4] = s[:n, 0:2]
            all_boxes[idx:idx + n, 4] = np.prod(s[:n] * 200, 1)
            all_boxes[idx:idx + n, 5] = score
            all_boxes[idx:idx + n, 6] = batch["annotation_id"][:n]
            all_boxes[idx:idx + n, 7] = float(lam)
            all_db_idx[idx:idx + n] = batch["db_index"][:n]
            image_path.extend(batch["image_path"][:n])
            idx += n
        if i % cfg.PRINT_FREQ == 0 or i == len(val_loader) - 1:
            logger.info("Test: [%d/%d]\tLoss %.6f (%.6f)\tAccuracy %.3f (%.3f)",
                        i, len(val_loader) - 1, losses.val, losses.avg,
                        acc.val, acc.avg)

    if jax.process_count() > 1:
        # DCN merge, same helper as validate(): int32-split annotation ids in
        # column 6 (λ in column 7 rides as a float), paths rebuilt from
        # gathered db indices (λ rows repeat the db row)
        import os as _os

        from ..parallel.mesh import dcn_merge_rows
        all_preds, all_boxes, db_idx_g, idx = dcn_merge_rows(
            all_preds, all_boxes, all_db_idx, idx, num_samples)
        image_path = [val_dataset.db[int(j)]["image"] for j in db_idx_g]
        if jax.process_index() > 0:
            output_dir = _os.path.join(output_dir, f"proc{jax.process_index()}")

    nv, nv0, nv1, perf = val_dataset.evaluate(
        cfg, all_preds[:idx], output_dir, all_boxes[:idx], image_path, epoch)
    model_name = type(model).__name__
    _print_name_value(nv, f"l0,1:{model_name}")    # validate.py:303-306
    _print_name_value(nv0, f"l0:{model_name}")
    _print_name_value(nv1, f"l1:{model_name}")
    if writer is not None:
        writer.add_scalar("valid_loss", losses.avg)
        writer.add_scalar("valid_acc", acc.avg)
    return perf


def validate_lambda(cfg, val_loader, val_dataset, model, variables,
                    output_dir=None, epoch=-1, mesh=None, writer=None,
                    print_prefix="",
                    lambda_vals=(0, 0.2, 0.4, 0.6, 0.8, 1.0)):
    """Qualitative λ sweep (legacy lib/core/validate.py:336-430): per-λ forward
    with lambda_vec = [λ, 1-λ] and the λ-weighted double loss — the reference
    deep-copies the targets for the 'b' branch (:349-352), so the weights sum
    out and only the model's λ response varies.  No decode/AP; returns
    {λ: (mean loss, mean acc)} for eyeballing a λ-conditioned model's morph."""
    J = int(cfg.MODEL.NUM_JOINTS)
    use_lambda = "lambda_fc" in variables.get("params", {})
    from .loss import joints_lambda_mse_loss

    def step(variables, batch, lambda_vec):
        if use_lambda:
            out = model.apply(variables, batch["input"], train=False,
                              lambda_vec=lambda_vec)
        else:
            out = model.apply(variables, batch["input"], train=False)
        l = joints_lambda_mse_loss(out, batch["target"], batch["target_weight"])
        lam = lambda_vec[:, 0]
        loss = (l * lam).mean() + (l * (1.0 - lam)).mean()
        acc, cnt, _ = pck_accuracy(out.transpose(0, 3, 1, 2),
                                   batch["target"].transpose(0, 3, 1, 2))
        return loss, acc, cnt

    step = jax.jit(step)
    meters = {lam: (AverageMeter(), AverageMeter()) for lam in lambda_vals}
    for batch in val_loader:
        dev_batch = {k: batch[k] for k in ("input", "target", "target_weight")}
        B = batch["input"].shape[0]
        n = int(batch["valid"].sum())
        for lam in lambda_vals:
            lambda_vec = jnp.concatenate(
                [jnp.full((B, 1), float(lam), jnp.float32),
                 jnp.full((B, 1), 1.0 - float(lam), jnp.float32)], axis=1)
            loss, acc, cnt = step(variables, dev_batch, lambda_vec)
            meters[lam][0].update(float(loss), n)
            meters[lam][1].update(float(acc), int(cnt))
    out = {}
    for lam, (lm, am) in meters.items():
        logger.info("lambda %.1f: loss %.6f acc %.3f", lam, lm.avg, am.avg)
        out[lam] = (lm.avg, am.avg)
    return out


def train_epoch(cfg, train_loader, model, state, train_step, epoch, rng,
                mesh=None, writer=None, output_dir=None):
    """One training epoch (function.py:102-175).  Returns the new state."""
    batch_time, data_time = AverageMeter(), AverageMeter()
    losses, acc = AverageMeter(), AverageMeter()
    end = time.time()

    def _stage(batch):
        dev_batch = {"input": batch["input"], "target": batch["target"],
                     "target_weight": batch["target_weight"]}
        if mesh is not None:
            from ..parallel.mesh import shard_batch
            dev_batch = shard_batch(dev_batch, mesh)
        return batch, dev_batch

    from ..utils.prefetch import prefetch

    for i, (batch, dev_batch) in enumerate(prefetch(
            train_loader, _stage, int(getattr(cfg.TPU, "PREFETCH", 2)))):
        data_time.update(time.time() - end)
        # the step folds state.step into this epoch key on device (state.py)
        state, metrics = train_step(state, dev_batch, rng)

        n = batch["input"].shape[0]
        batch_time.update(time.time() - end)
        end = time.time()

        if i % cfg.PRINT_FREQ == 0:
            # fetch metrics only at print time: a per-step host fetch would fence
            # the device every step and kill dispatch pipelining
            losses.update(float(metrics["loss"]), n)
            acc.update(float(metrics["acc"]), max(int(metrics["cnt"]), 1))
            logger.info(
                "Epoch: [%d][%d/%d]\tTime %.3fs (%.3fs)\tData %.3fs\t"
                "Loss %.5f (%.5f)\tAccuracy %.3f (%.3f)",
                epoch, i, len(train_loader), batch_time.val, batch_time.avg,
                data_time.val, losses.val, losses.avg, acc.val, acc.avg)
            if writer is not None:
                writer.add_scalar("train_loss", losses.val)
                writer.add_scalar("train_acc", acc.val)
            # train debug dumps every-50th epoch (function.py:169-172); the
            # step returns heatmaps only when DEBUG.DEBUG (train/state.py)
            if (cfg.DEBUG.DEBUG and "out" in metrics and output_dir
                    and epoch % 50 == 0):
                import os as _os

                from ..ops import get_max_preds
                from ..parallel.mesh import host_local_rows
                from ..utils.vis import save_debug_images

                # "out" stays data-sharded (train/state.py): under multi-host
                # only this process's rows are addressable — and they are
                # exactly the rows of the process-local batch["input"]
                hm = host_local_rows(metrics["out"])      # NHWC, as rendered
                hm_pred, _ = get_max_preds(hm.transpose(0, 3, 1, 2))
                stride = cfg.MODEL.IMAGE_SIZE[0] / cfg.MODEL.HEATMAP_SIZE[0]
                import jax as _jax
                ptag = (f"_proc{_jax.process_index()}"
                        if _jax.process_count() > 1 else "")
                prefix = _os.path.join(output_dir,
                                       f"train_epoch_{epoch}_iter_{i}{ptag}")
                save_debug_images(cfg, batch["input"], batch,
                                  np.asarray(batch["target"]),
                                  np.asarray(hm_pred) * stride, hm, prefix)
    return state, rng


def _print_name_value(name_value, full_arch_name):
    """Markdown AP table (function.py:340-357)."""
    if not isinstance(name_value, dict):
        return
    names, values = list(name_value.keys()), list(name_value.values())
    logger.info("| Arch " + " ".join([f"| {n}" for n in names]) + " |")
    logger.info("|---" * (len(names) + 1) + "|")
    if len(full_arch_name) > 15:
        full_arch_name = full_arch_name[:8] + "..."
    logger.info(f"| {full_arch_name} "
                + " ".join([f"| {v:.3f}" for v in values]) + " |")
