"""Checkpoint conversion CLI: reference torch .pth -> orbax params directory.

    python tools/convert.py --cfg experiments/coco/buctd/coam_w48_384x288.yaml \\
        --torch models/BUCTD_CoAM_W48.pth --out converted/coam_w48

The converted directory loads via TEST.MODEL_FILE / PoseEstimator(checkpoint=...).
"""

import argparse

import _init_paths  # noqa: F401


def main():
    ap = argparse.ArgumentParser(description="torch .pth -> orbax converter")
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--torch", required=True, dest="torch_path")
    ap.add_argument("--out", required=True)
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    args.modelDir = args.logDir = args.dataDir = ""

    import jax
    import jax.numpy as jnp

    from buctd_tpu.config import default_config, update_config
    from buctd_tpu.convert import load_torch_checkpoint, torch_to_flax
    from buctd_tpu.data.pipeline import num_input_channels
    from buctd_tpu.models import converter_options, get_model
    from buctd_tpu.train.checkpoint import save_params

    cfg = default_config()
    update_config(cfg, args)

    model = get_model(cfg, is_train=False)
    img_w, img_h = cfg.MODEL.IMAGE_SIZE
    template = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, img_h, img_w, num_input_channels(cfg))), train=False))(
        jax.random.PRNGKey(0))

    sd = load_torch_checkpoint(args.torch_path)
    variables = torch_to_flax(sd, template, **converter_options(cfg.MODEL.NAME))
    save_params(variables, args.out)
    n = sum(x.size for x in jax.tree.leaves(variables["params"]))
    print(f"converted {len(sd)} torch tensors -> {args.out} ({n:,} params)")


if __name__ == "__main__":
    main()
