"""Training CLI (reference: tools/train.py).

Same surface: ``python tools/train.py --cfg <yaml> [KEY VALUE ...]``.
TPU-native internals: jax mesh data parallelism instead of nn.DataParallel, one jitted
train step, orbax checkpoints, device-side batch preprocessing.
"""

import argparse
import contextlib
import os
import pprint

import _init_paths  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from buctd_tpu.config import default_config, update_config
from buctd_tpu.core.function import train_epoch, validate
from buctd_tpu.data import Loader, get_dataset, num_input_channels
from buctd_tpu.models import converter_options, get_model
from buctd_tpu.parallel import make_mesh, replicate
from buctd_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from buctd_tpu.train.state import create_train_state, make_train_step
from buctd_tpu.utils import MetricWriter, create_logger, get_model_summary, set_seed


def parse_args():
    parser = argparse.ArgumentParser(description="Train keypoints network")
    parser.add_argument("--cfg", required=True, type=str)
    parser.add_argument("--modelDir", type=str, default="")
    parser.add_argument("--logDir", type=str, default="")
    parser.add_argument("--dataDir", type=str, default="")
    parser.add_argument("--prevModelDir", type=str, default="")
    parser.add_argument("--seed", type=int, default=22)
    # multi-host launch (pod slice / multi-process CPU): run the SAME command on
    # every host with --coordinator <host0-ip:port> --num-processes N
    # --process-id <rank>; on Cloud TPU the three are auto-detected and none are
    # needed (buctd_tpu/parallel/distributed.py).  Example 2-process CPU run:
    #   python tools/train.py --cfg C --coordinator localhost:9876 \
    #       --num-processes 2 --process-id 0 &
    #   python tools/train.py --cfg C --coordinator localhost:9876 \
    #       --num-processes 2 --process-id 1
    parser.add_argument("--coordinator", type=str, default=None)
    parser.add_argument("--num-processes", dest="num_processes", type=int,
                        default=None)
    parser.add_argument("--process-id", dest="process_id", type=int, default=None)
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="Modify config options using the command-line")
    return parser.parse_args()


def load_warm_start(cfg, model, variables):
    """Warm start: MODEL.PRETRAINED loads an ImageNet-pretrained subset by
    PRETRAINED_LAYERS (pose_hrnet.py:596-614); TEST.MODEL_FILE loads a full
    checkpoint (tools/train.py:126-145, orbax dir or torch .pth)."""
    import os

    if cfg.MODEL.INIT_WEIGHTS and cfg.MODEL.PRETRAINED:
        if not os.path.isfile(cfg.MODEL.PRETRAINED):
            raise ValueError(f"MODEL.PRETRAINED not found: {cfg.MODEL.PRETRAINED}")
        from buctd_tpu.convert import load_pretrained_subset, load_torch_checkpoint
        layers = list(cfg.MODEL.EXTRA.get("PRETRAINED_LAYERS", ["*"]))
        sd = load_torch_checkpoint(cfg.MODEL.PRETRAINED)
        opts = converter_options(cfg.MODEL.NAME)
        variables = load_pretrained_subset(variables, sd, layers,
                                           key_map=opts.get("key_map"))

    path = cfg.TEST.MODEL_FILE
    if not path:
        return variables
    if path.endswith(".pth") or path.endswith(".pt"):
        from buctd_tpu.convert import load_torch_checkpoint, torch_to_flax
        sd = load_torch_checkpoint(path)
        return torch_to_flax(sd, variables, **converter_options(cfg.MODEL.NAME))
    from buctd_tpu.train.checkpoint import load_params
    return load_params(path, template=variables)


def main():
    args = parse_args()
    cfg = default_config()
    update_config(cfg, args)
    set_seed(args.seed)

    # multi-host first: jax.distributed must connect before any device query
    from buctd_tpu.parallel import initialize_distributed
    initialize_distributed(args.coordinator, args.num_processes, args.process_id)

    logger, final_output_dir, tb_log_dir = create_logger(cfg, args.cfg, "train")
    logger.info(pprint.pformat(cfg))
    writer = MetricWriter(tb_log_dir)

    mesh = make_mesh(cfg)
    logger.info("=> mesh: %s over %d devices", mesh.axis_names, mesh.size)

    from buctd_tpu.models import compute_dtype
    model = get_model(cfg, is_train=True, dtype=compute_dtype(cfg))
    C = num_input_channels(cfg)
    img_w, img_h = cfg.MODEL.IMAGE_SIZE
    sample = jnp.zeros((1, img_h, img_w, C))

    rng = jax.random.PRNGKey(args.seed)
    init_rng, train_rng = jax.random.split(rng)
    variables = jax.jit(lambda k: model.init(k, sample, train=False))(init_rng)
    logger.info(get_model_summary(model, variables, (1, img_h, img_w, C)))
    variables = load_warm_start(cfg, model, variables)

    train_dataset = get_dataset(cfg, is_train=True)
    valid_dataset = get_dataset(cfg, is_train=False)
    # global batch = per-chip batch x mesh size (the reference's DataParallel
    # semantics: BATCH_SIZE_PER_GPU * len(GPUS), tools/train.py:187).
    # Multi-host: the loaders internally serve only this process's contiguous
    # rows of each global batch over its shard of the (same-seed) epoch order
    # (data/pipeline.py shard_epoch_order), so N processes together feed exactly
    # one global batch per step — not N duplicated copies.
    if cfg.TPU.DEVICE_PIPELINE:
        from buctd_tpu.data.device_pipeline import DeviceLoader
        train_loader = DeviceLoader(
            train_dataset, cfg, batch_size=cfg.TRAIN.BATCH_SIZE_PER_GPU * mesh.size,
            shuffle=cfg.TRAIN.SHUFFLE, num_workers=cfg.WORKERS)
    else:
        train_loader = Loader(train_dataset, cfg,
                              batch_size=cfg.TRAIN.BATCH_SIZE_PER_GPU * mesh.size,
                              shuffle=cfg.TRAIN.SHUFFLE, num_workers=cfg.WORKERS)
    valid_loader = Loader(valid_dataset, cfg,
                          batch_size=cfg.TEST.BATCH_SIZE_PER_GPU * mesh.size,
                          num_workers=cfg.WORKERS)

    steps_per_epoch = max(len(train_loader), 1)
    state = create_train_state(cfg, model, init_rng, sample,
                               steps_per_epoch=steps_per_epoch,
                               variables=variables)
    begin_epoch = cfg.TRAIN.BEGIN_EPOCH
    best_perf, best_model = 0.0, False

    if cfg.AUTO_RESUME:
        state, found = restore_checkpoint(state, final_output_dir)
        if found:
            begin_epoch = int(state.step) // steps_per_epoch
            logger.info("=> auto-resumed at epoch %d", begin_epoch)

    state = replicate(state, mesh)
    if cfg.TRAIN.MIX:
        # cutmix/mixup: on-device batch mixing + λ-weighted double loss
        # (reference lib/core/train.py:179-343 semantics)
        from buctd_tpu.train.state import make_train_step_mixed
        train_step = make_train_step_mixed(cfg, model, mesh)
        logger.info("=> %s training (alpha=%.2f)", cfg.TRAIN.MIX,
                    cfg.TRAIN.MIX_ALPHA)
    else:
        train_step = make_train_step(cfg, model, mesh)

    from buctd_tpu.utils.profiler import trace_context
    for epoch in range(begin_epoch, cfg.TRAIN.END_EPOCH):
        # BUCTD_PROFILE_DIR=/path captures a jax.profiler device trace of the
        # first trained epoch (no-op otherwise)
        with trace_context() if epoch == begin_epoch else contextlib.nullcontext():
            state, train_rng = train_epoch(cfg, train_loader, model, state,
                                           train_step, epoch, train_rng,
                                           mesh=mesh, writer=writer,
                                           output_dir=final_output_dir)

        perf = 0.0
        if (epoch + 1) % cfg.EPOCH_EVAL_FREQ == 0 or epoch == cfg.TRAIN.END_EPOCH - 1:
            eval_vars = {"params": state.params, "batch_stats": state.batch_stats}
            _, perf = validate(cfg, valid_loader, valid_dataset, model, eval_vars,
                               final_output_dir, epoch=epoch, mesh=mesh,
                               writer=writer)
        best_model = perf > best_perf
        best_perf = max(perf, best_perf)

        logger.info("=> saving checkpoint to %s", final_output_dir)
        # async: the ~40s orbax write overlaps the next epoch's compute
        save_checkpoint(state, final_output_dir, is_best=best_model, perf=perf,
                        block=False)
        if (epoch + 1) % 20 == 0:
            save_checkpoint(state, final_output_dir, name=f"checkpoint_ep{epoch}",
                            perf=perf, block=False)

    save_checkpoint(state, final_output_dir, name="final_state", perf=best_perf)
    logger.info("=> done; best perf %.4f", best_perf)
    writer.close()


if __name__ == "__main__":
    main()
