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


class _CaptureLambdaDataset(_CaptureDataset):
    """The reference λ sweep expects evaluate() to return six values
    (validate.py:296-301)."""

    def evaluate(self, cfg, preds, output_dir, all_boxes, img_path, *a, **k):
        self.captured = {"preds": np.array(preds), "boxes": np.array(all_boxes),
                         "paths": list(img_path)}
        nv = {"AP": 0.0}
        return nv, nv, nv, nv, nv, 0.0


@pytest.mark.slow
def test_reference_validate_lambda_vs_ours(tmp_path):
    """Protocol parity for the λ∈{0,1} sweep (lib/core/validate.py:175-333):
    double pass per batch, plain-flip test, DECAY_THRE score decay on λ=0, and
    the 8-column all_boxes accumulation with λ in the last column.

    The λ-conditioned MIPNet model is not part of the reference repo, so both
    sides run a model that ignores λ (torch: a wrapper dropping lambda_vec; ours:
    use_lambda auto-off because the converted params have no λ head) — exactly
    the situation of every model the reference actually ships."""
    ann_file, _ = _tiny_coco(tmp_path)
    cfg = _cfg([
        "MODEL.CONDITIONAL_TOPDOWN", "True", "DATASET.COLORED", "True",
        "DATASET.SYNTHESIS_POSE", "False",
        "TEST.USE_BU_BBOX", "True", "TEST.USE_GT_BBOX", "False",
        "DATASET.TEST_IMAGE_DIR", str(tmp_path),
        "DATASET.TEST_ANNOTATION_FILE", ann_file,
        "MODEL.IMAGE_SIZE", "[96, 128]", "MODEL.HEATMAP_SIZE", "[24, 32]",
        "MODEL.EXTRA.USE_PRE_NET", "True",
        "MODEL.EXTRA.STAGE2.NUM_MODULES", "1",
        "MODEL.EXTRA.STAGE3.NUM_MODULES", "1",
        "MODEL.EXTRA.STAGE4.NUM_MODULES", "1",
        "TEST.FLIP_TEST", "True", "TEST.SHIFT_HEATMAP", "True",
        "TEST.POST_PROCESS", "True", "TEST.BATCH_SIZE_PER_GPU", "4",
        "TEST.DECAY_THRE", "0.5", "PRINT_FREQ", "100",
    ])

    import jax
    import jax.numpy as jnp

    from buctd_tpu.convert import torch_to_flax
    from buctd_tpu.core.function import validate_lambda_quantitative
    from buctd_tpu.data import Loader, get_dataset
    from buctd_tpu.models import get_model

    ours_ds = get_dataset(cfg, is_train=False)

    import models.pose_hrnet as ref_arch
    base = ref_arch.get_pose_net(cfg, is_train=False)
    base.eval()

    class LambdaIgnoring(torch.nn.Module):
        def __init__(self, m):
            super().__init__()
            self.m = m

        def forward(self, x, lambda_vec=None):
            return self.m(x)

    flax_model = get_model(cfg)
    template = flax_model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 128, 96, 6)), train=False)
    variables = torch_to_flax(base.state_dict(), template)

    from test_data_pipeline import _ref_joints_dataset, _torch_normalize
    ref_jd = _ref_joints_dataset(cfg, False, _torch_normalize)
    ref_jd.db = ours_ds.db

    ref_validate = _load_ref("ref_core_validate",
                             "/root/reference/lib/core/validate.py")
    cap = _CaptureLambdaDataset(ref_jd)
    loader = torch.utils.data.DataLoader(cap, batch_size=4, shuffle=False)

    class Criterion(torch.nn.Module):
        def forward(self, output, target, target_weight):
            return torch.tensor(0.0)

    _seed_all(9)
    ref_validate.validate_lambda_quantitative(
        cfg, loader, cap, LambdaIgnoring(base), Criterion(), str(tmp_path),
        str(tmp_path), lambda_vals=[0, 1])
    ref_preds, ref_boxes = cap.captured["preds"], cap.captured["boxes"]

    _seed_all(9)
    our_loader = Loader(ours_ds, cfg, batch_size=4, num_workers=1)
    captured = {}
    orig_eval = type(ours_ds).evaluate

    def capture_eval(self, cfg, preds, output_dir, all_boxes, img_path, *a, **k):
        captured.update(preds=np.array(preds), boxes=np.array(all_boxes))
        nv = {"AP": 0.0}
        return nv, nv, nv, 0.0

    type(ours_ds).evaluate = capture_eval
    try:
        validate_lambda_quantitative(cfg, our_loader, ours_ds, flax_model,
                                     variables, str(tmp_path))
    finally:
        type(ours_ds).evaluate = orig_eval

    got_preds, got_boxes = captured["preds"], captured["boxes"]
    assert got_preds.shape == ref_preds.shape
    assert got_boxes.shape == ref_boxes.shape == (len(ours_ds.db) * 2, 8)
    # per-mode interleave order differs only within (batch, λ) nesting — both
    # sides nest λ inside batch, so rows align 1:1
    np.testing.assert_allclose(got_boxes, ref_boxes, atol=1e-3)
    d = np.linalg.norm(got_preds[..., :2] - ref_preds[..., :2], axis=-1)
    assert float((d < 1.0).mean()) > 0.95, (np.median(d), d.max())
    assert np.median(d) < 0.1
    conf_err = np.abs(got_preds[..., 2] - ref_preds[..., 2])[d < 1.0]
    assert conf_err.max() < 5e-3


def test_validate_lambda_qualitative(tmp_path):
    """Qualitative λ sweep (legacy validate.py:336-430): per-λ loss/acc dict
    over the default 6-value grid; λ-head model responds to λ."""
    ann_file, _ = _tiny_coco(tmp_path)
    cfg = _cfg([
        "MODEL.CONDITIONAL_TOPDOWN", "True", "DATASET.COLORED", "True",
        "DATASET.SYNTHESIS_POSE", "False",
        "TEST.USE_BU_BBOX", "True", "TEST.USE_GT_BBOX", "False",
        "DATASET.TEST_IMAGE_DIR", str(tmp_path),
        "DATASET.TEST_ANNOTATION_FILE", ann_file,
        "MODEL.IMAGE_SIZE", "[96, 128]", "MODEL.HEATMAP_SIZE", "[24, 32]",
        "MODEL.EXTRA.USE_PRE_NET", "True",
        "MODEL.EXTRA.STAGE2.NUM_MODULES", "1",
        "MODEL.EXTRA.STAGE3.NUM_MODULES", "1",
        "MODEL.EXTRA.STAGE4.NUM_MODULES", "1",
        "TEST.BATCH_SIZE_PER_GPU", "4",
    ])
    import jax
    import jax.numpy as jnp

    from buctd_tpu.core.function import validate_lambda
    from buctd_tpu.data import Loader, get_dataset
    from buctd_tpu.models import get_model

    ds = get_dataset(cfg, is_train=False)
    model = get_model(cfg)
    lv = jnp.zeros((1, 2))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 96, 6)),
                           train=False, lambda_vec=lv)
    loader = Loader(ds, cfg, batch_size=4, num_workers=1)
    out = validate_lambda(cfg, loader, ds, model, variables, str(tmp_path))
    assert set(out) == {0, 0.2, 0.4, 0.6, 0.8, 1.0}
    for lam, (loss, acc) in out.items():
        assert np.isfinite(loss) and np.isfinite(acc)


def test_evaluate_lambda_end_to_end(tmp_path):
    """Our evaluate_lambda (8-col dispatch -> per-mode eval + oks_merge) returns
    finite APs and writes the three results jsons — makes ops/nms.py oks_merge a
    production-reachable path (VERDICT item 4 acceptance)."""
    from test_data_pipeline import _cfg as _c  # noqa: F401
    ann_file, _ = _tiny_coco(tmp_path)
    cfg = _cfg([
        "DATASET.TEST_IMAGE_DIR", str(tmp_path),
        "DATASET.TEST_ANNOTATION_FILE", ann_file,
        "MODEL.CONDITIONAL_TOPDOWN", "True", "DATASET.COLORED", "True",
        "TEST.USE_BU_BBOX", "True", "TEST.USE_GT_BBOX", "False",
    ])
    from buctd_tpu.data import get_dataset
    ds = get_dataset(cfg, is_train=False)
    N, J = len(ds.db), int(cfg.MODEL.NUM_JOINTS)
    rng = np.random.RandomState(0)
    # two modes of predictions: GT joints + small noise, full confidence
    preds = np.zeros((2 * N, J, 3), np.float32)
    boxes = np.zeros((2 * N, 8))
    paths = []
    for m in range(2):
        for i, rec in enumerate(ds.db):
            row = m * N + i
            preds[row, :, :2] = rec["joints_3d"][:, :2] + rng.randn(J, 2) * (m + 1)
            preds[row, :, 2] = 0.9
            boxes[row, 0:2] = rec["center"]
            boxes[row, 2:4] = rec["scale"]
            boxes[row, 4] = np.prod(np.asarray(rec["scale"]) * 200)
            boxes[row, 5] = 1.0 if m else cfg.TEST.DECAY_THRE
            boxes[row, 6] = rec["annotation_id"]
            boxes[row, 7] = m
            paths.append(rec["image"])
    nv, nv0, nv1, perf = ds.evaluate(cfg, preds, str(tmp_path), boxes, paths)
    for d in (nv, nv0, nv1):
        assert np.isfinite(d["AP"]), d
    assert perf == nv["AP"]
    import glob
    files = glob.glob(str(tmp_path) + "/results/*_l0.json") + \
        glob.glob(str(tmp_path) + "/results/*_l1.json") + \
        glob.glob(str(tmp_path) + "/results/*_merged.json")
    assert len(files) == 3


ARCH_OPTS = {
    "prenet": ["MODEL.EXTRA.USE_PRE_NET", "True"],
    "coam": ["MODEL.NAME", "pose_hrnet_coam",
             "MODEL.EXTRA.USE_ATTENTION", "True",
             "MODEL.ATT_MODULES", "[False, True, False, False]",
             "MODEL.ATTENTION_HEADS", "1"],
    "transpose": ["MODEL.NAME", "transpose_h",
                  "MODEL.EXTRA.USE_ATTENTION", "True",
                  "MODEL.DIM_MODEL", "96", "MODEL.DIM_FEEDFORWARD", "192",
                  "MODEL.N_HEAD", "2", "MODEL.ENCODER_LAYERS", "3",
                  "MODEL.POS_EMBEDDING", "sine"],
    "resnet": ["MODEL.NAME", "pose_resnet",
               "MODEL.EXTRA.NUM_LAYERS", "18",
               "MODEL.EXTRA.NUM_DECONV_LAYERS", "3",
               "MODEL.EXTRA.NUM_DECONV_FILTERS", "[256, 256, 256]",
               "MODEL.EXTRA.NUM_DECONV_KERNELS", "[4, 4, 4]",
               "MODEL.EXTRA.DECONV_WITH_BIAS", "False",
               "MODEL.EXTRA.USE_PRE_NET", "True"],
}
REF_MODULES = {"prenet": "models.pose_hrnet", "coam": "models.pose_hrnet_coam",
               "transpose": "models.transpose_h", "resnet": "models.pose_resnet"}


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["prenet", "coam", "transpose", "resnet"])
def test_reference_validate_vs_ours(tmp_path, arch):
    """Full eval-protocol lock for EVERY conditional architecture (VERDICT item 8)."""
    ann_file, _ = _tiny_coco(tmp_path)
    arch_opts = ARCH_OPTS[arch]
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

    import importlib

    from buctd_tpu.models import converter_options
    ref_arch = importlib.import_module(REF_MODULES[arch])
    torch_model = ref_arch.get_pose_net(cfg, is_train=False)
    torch_model.eval()

    flax_model = get_model(cfg)
    template = flax_model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 128, 96, 6)), train=False)
    variables = torch_to_flax(torch_model.state_dict(), template,
                              **converter_options(cfg.MODEL.NAME))

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
