"""End-to-end eval-protocol parity: the REFERENCE's torch validate() loop vs ours,
on identical db records, with the same (converted) weights.

This locks the full protocol chain — per-sample pipeline, flip-test with condition
re-render, SHIFT_HEATMAP, ±0.25px nudge decode, inverse-affine unprojection, and the
all_preds/all_boxes accumulation — not just the pieces (which have their own
parity tests)."""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_data_pipeline import _cfg, _seed_all, _tiny_coco
from test_torch_parity import _compare  # noqa: F401  (brings in torchvision stub + cuda shims)

sys.path.insert(0, "/root/reference/lib")


def _load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class _CaptureDataset(torch.utils.data.Dataset):
    """Wraps the reference JointsDataset around OUR db records and captures the
    all_preds/all_boxes that reference validate() passes to evaluate()."""

    def __init__(self, ref_jd):
        self.jd = ref_jd
        self.captured = {}

    def __len__(self):
        return len(self.jd.db)

    def __getitem__(self, idx):
        return self.jd[idx]

    @property
    def flip_pairs(self):
        return self.jd.flip_pairs

    def __getattr__(self, name):
        return getattr(self.jd, name)

    def evaluate(self, cfg, preds, output_dir, all_boxes, img_path, *a, **k):
        self.captured = {"preds": np.array(preds), "boxes": np.array(all_boxes),
                         "paths": list(img_path)}
        return {"AP": 0.0}, 0.0


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["prenet", "coam"])
def test_reference_validate_vs_ours(tmp_path, arch):
    ann_file, _ = _tiny_coco(tmp_path)
    arch_opts = (["MODEL.EXTRA.USE_PRE_NET", "True"] if arch == "prenet" else
                 ["MODEL.NAME", "pose_hrnet_coam",
                  "MODEL.EXTRA.USE_ATTENTION", "True",
                  "MODEL.ATT_MODULES", "[False, True, False, False]",
                  "MODEL.ATTENTION_HEADS", "1"])
    cfg = _cfg([
        "MODEL.CONDITIONAL_TOPDOWN", "True", "DATASET.COLORED", "True",
        "DATASET.SYNTHESIS_POSE", "False",
        "TEST.USE_BU_BBOX", "True", "TEST.USE_GT_BBOX", "False",
        "DATASET.TEST_IMAGE_DIR", str(tmp_path),
        "DATASET.TEST_ANNOTATION_FILE", ann_file,
        "MODEL.IMAGE_SIZE", "[96, 128]", "MODEL.HEATMAP_SIZE", "[24, 32]",
        # conditional plain-HRNet requires the preNet fusion stems: the reference's
        # conv1 is always 3-channel (pose_hrnet.py:287)
        *arch_opts,
        "MODEL.EXTRA.STAGE2.NUM_MODULES", "1",
        "MODEL.EXTRA.STAGE3.NUM_MODULES", "1",
        "MODEL.EXTRA.STAGE4.NUM_MODULES", "1",
        "TEST.FLIP_TEST", "True", "TEST.SHIFT_HEATMAP", "True",
        "TEST.POST_PROCESS", "True", "TEST.BATCH_SIZE_PER_GPU", "4",
        "PRINT_FREQ", "100",
    ])

    # ---- shared pieces: our dataset (db builder) + our flax model ------------
    import jax
    import jax.numpy as jnp

    from buctd_tpu.convert import torch_to_flax
    from buctd_tpu.core.function import validate as our_validate
    from buctd_tpu.data import Loader, get_dataset
    from buctd_tpu.models import get_model

    ours_ds = get_dataset(cfg, is_train=False)

    if arch == "prenet":
        import models.pose_hrnet as ref_arch
    else:
        import models.pose_hrnet_coam as ref_arch
    torch_model = ref_arch.get_pose_net(cfg, is_train=False)
    torch_model.eval()

    flax_model = get_model(cfg)
    template = flax_model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 128, 96, 6)), train=False)
    variables = torch_to_flax(torch_model.state_dict(), template)

    # ---- reference validate ---------------------------------------------------
    from test_data_pipeline import _ref_joints_dataset, _torch_normalize
    ref_jd = _ref_joints_dataset(cfg, False, _torch_normalize)
    ref_jd.db = ours_ds.db  # identical records

    ref_function = _load_ref("ref_core_function",
                             "/root/reference/lib/core/function.py")
    cap = _CaptureDataset(ref_jd)
    loader = torch.utils.data.DataLoader(cap, batch_size=4, shuffle=False)

    class Criterion(torch.nn.Module):
        def forward(self, output, target, target_weight):
            return torch.tensor(0.0)

    _seed_all(9)
    ref_function.validate(cfg, loader, cap, torch_model, Criterion(),
                          str(tmp_path), str(tmp_path))
    ref_preds = cap.captured["preds"]
    ref_boxes = cap.captured["boxes"]

    # ---- our validate ---------------------------------------------------------
    _seed_all(9)
    our_loader = Loader(ours_ds, cfg, batch_size=4, num_workers=1)

    captured = {}
    orig_eval = type(ours_ds).evaluate

    def capture_eval(self, cfg, preds, output_dir, all_boxes, img_path, *a, **k):
        captured.update(preds=np.array(preds), boxes=np.array(all_boxes))
        return {"AP": 0.0}, 0.0

    type(ours_ds).evaluate = capture_eval
    try:
        our_validate(cfg, our_loader, ours_ds, flax_model, variables,
                     str(tmp_path))
    finally:
        type(ours_ds).evaluate = orig_eval

    got_preds, got_boxes = captured["preds"], captured["boxes"]
    assert got_preds.shape == ref_preds.shape

    # boxes (center/scale/area/score/ann-id) must match exactly
    np.testing.assert_allclose(got_boxes, ref_boxes, atol=1e-3)
    # coordinates: identical up to crop-pixel LSB noise; allow rare near-tie
    # argmax flips with random weights
    d = np.linalg.norm(got_preds[..., :2] - ref_preds[..., :2], axis=-1)
    frac_close = float((d < 1.0).mean())
    assert frac_close > 0.95, (frac_close, np.median(d), d.max())
    assert np.median(d) < 0.1
    # confidences line up where coordinates agree
    conf_err = np.abs(got_preds[..., 2] - ref_preds[..., 2])[d < 1.0]
    assert conf_err.max() < 5e-3
