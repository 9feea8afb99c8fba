"""Evaluation CLI (reference: tools/test.py) + in-process iterative refinement.

Same surface: ``python tools/test.py --cfg <yaml> [KEY VALUE ...]``.  Checkpoints may
be orbax dirs (ours) or torch .pth (reference, via the converter — this is the parity
path in BASELINE.md).

TEST.REFINE_ITERS > 1 runs the 3x iterative-refinement loop IN PROCESS: each round's
results json feeds the next round's conditions + condition-derived boxes, exactly the
protocol the reference runs as three manual invocations (README.md:104,
dataloader.py:337-339 dispatch).
"""

import argparse
import os
import pprint

import _init_paths  # noqa: F401
import jax
import jax.numpy as jnp

from buctd_tpu.config import default_config, update_config
from buctd_tpu.core.function import validate
from buctd_tpu.data import Loader, get_dataset, num_input_channels
from buctd_tpu.models import converter_options, get_model
from buctd_tpu.parallel import make_mesh, replicate
from buctd_tpu.utils import MetricWriter, create_logger, get_model_summary


def parse_args():
    parser = argparse.ArgumentParser(description="Test keypoints network")
    parser.add_argument("--cfg", required=True, type=str)
    parser.add_argument("--modelDir", type=str, default="")
    parser.add_argument("--logDir", type=str, default="")
    parser.add_argument("--dataDir", type=str, default="")
    # multi-host launch: same three flags + recipe as tools/train.py
    parser.add_argument("--coordinator", type=str, default=None)
    parser.add_argument("--num-processes", dest="num_processes", type=int,
                        default=None)
    parser.add_argument("--process-id", dest="process_id", type=int, default=None)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    return parser.parse_args()


def load_variables(cfg, model, final_output_dir):
    img_w, img_h = cfg.MODEL.IMAGE_SIZE
    C = num_input_channels(cfg)
    sample = jnp.zeros((1, img_h, img_w, C))
    template = jax.jit(lambda k: model.init(k, sample, train=False))(
        jax.random.PRNGKey(0))

    path = cfg.TEST.MODEL_FILE
    if path and (path.endswith(".pth") or path.endswith(".pt")):
        from buctd_tpu.convert import load_torch_checkpoint, torch_to_flax
        sd = load_torch_checkpoint(path)  # prefers 'latest_state_dict' (test.py:120)
        return torch_to_flax(sd, template, **converter_options(cfg.MODEL.NAME))
    from buctd_tpu.train.checkpoint import load_params
    if path:
        return load_params(path, template=template)
    try:
        return load_params(os.path.join(final_output_dir, "model_best"),
                           template=template)
    except Exception:
        import logging
        logging.getLogger(__name__).warning(
            "=> no checkpoint found (TEST.MODEL_FILE empty, no model_best); "
            "evaluating randomly-initialized weights")
        return template


def main():
    args = parse_args()
    cfg = default_config()
    update_config(cfg, args)

    # multi-host first: jax.distributed must connect before any device query
    from buctd_tpu.parallel import initialize_distributed
    initialize_distributed(args.coordinator, args.num_processes, args.process_id)

    logger, final_output_dir, tb_log_dir = create_logger(cfg, args.cfg, "valid")
    logger.info(pprint.pformat(cfg))
    writer = MetricWriter(tb_log_dir)

    mesh = make_mesh(cfg)
    from buctd_tpu.models import compute_dtype
    model = get_model(cfg, is_train=False, dtype=compute_dtype(cfg, "EVAL_DTYPE"))
    variables = load_variables(cfg, model, final_output_dir)
    from buctd_tpu.models.fuse import maybe_fuse_prenet
    model, variables = maybe_fuse_prenet(cfg, model, variables)
    img_w, img_h = cfg.MODEL.IMAGE_SIZE
    logger.info(get_model_summary(model, variables,
                                  (1, img_h, img_w, num_input_channels(cfg))))
    variables = replicate(variables, mesh)

    refine_iters = max(int(cfg.TEST.REFINE_ITERS), 1)
    if cfg.TEST.LAMBDA_SWEEP and refine_iters > 1:
        raise ValueError("TEST.LAMBDA_SWEEP writes per-mode/_merged results, "
                         "which the refinement feedback loop cannot consume; "
                         "use one or the other")
    user_output_json = cfg.OUTPUT_JSON
    perf = None
    for it in range(refine_iters):
        if refine_iters > 1:
            # intermediate rounds must write the default epoch-numbered results
            # path (the next round reads it); OUTPUT_JSON applies to the final one
            cfg.defrost()
            cfg.OUTPUT_JSON = (user_output_json if it == refine_iters - 1 else None)
            cfg.freeze()
        valid_dataset = get_dataset(cfg, is_train=False)
        if cfg.TPU.DEVICE_PIPELINE:
            from buctd_tpu.data.device_pipeline import DeviceLoader
            valid_loader = DeviceLoader(
                valid_dataset, cfg,
                batch_size=cfg.TEST.BATCH_SIZE_PER_GPU * mesh.size,
                num_workers=cfg.WORKERS)
        else:
            valid_loader = Loader(valid_dataset, cfg,
                                  batch_size=cfg.TEST.BATCH_SIZE_PER_GPU * mesh.size,
                                  num_workers=cfg.WORKERS)
        from buctd_tpu.utils.profiler import trace_context
        with trace_context():   # BUCTD_PROFILE_DIR=/path captures a device trace
            if cfg.TEST.LAMBDA_SWEEP:
                # λ∈{0,1} double eval + DECAY_THRE rescoring + oks_merge of the
                # two modes (legacy lib/core/validate.py:175-333; not
                # CLI-reachable in the reference — wired here behind a flag)
                from buctd_tpu.core.function import validate_lambda_quantitative
                perf = validate_lambda_quantitative(
                    cfg, valid_loader, valid_dataset, model, variables,
                    final_output_dir, epoch=it, mesh=mesh, writer=writer,
                    print_prefix=f"refine{it}")
            else:
                name_values, perf = validate(cfg, valid_loader, valid_dataset,
                                             model, variables, final_output_dir,
                                             epoch=it, mesh=mesh, writer=writer,
                                             print_prefix=f"refine{it}")
        logger.info("=> refinement round %d: AP %.4f", it, perf)
        if it < refine_iters - 1:
            # feed this round's results back as next round's conditions.
            # Every process reads its OWN copy (validate() redirects proc>0
            # evaluate output to a proc{q}/ subdir): the merged result set is
            # identical on every host, and reading another process's file
            # would race its unsynchronized evaluate (or not exist at all on
            # per-host filesystems).
            import jax as _jax
            proc_dir = (final_output_dir if _jax.process_index() == 0 else
                        os.path.join(final_output_dir,
                                     f"proc{_jax.process_index()}"))
            res_file = os.path.join(proc_dir, "results",
                                    f"keypoints_test_results_epoch{it}.json")
            cfg.defrost()
            cfg.TEST.COCO_BBOX_FILE = res_file
            cfg.TEST.USE_BU_BBOX = True
            cfg.freeze()
    writer.close()
    return perf


if __name__ == "__main__":
    main()
