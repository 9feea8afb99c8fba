"""CLI smoke tests: tools/train.py (2 epochs, tiny model, 8-device CPU mesh) and
tools/test.py incl. 2x in-process iterative refinement, on the synthetic tiny COCO."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from test_data_pipeline import _tiny_coco

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_OPTS = [
    "MODEL.IMAGE_SIZE", "[96, 128]", "MODEL.HEATMAP_SIZE", "[24, 32]",
    "MODEL.EXTRA.STAGE2.NUM_MODULES", "1",
    "MODEL.EXTRA.STAGE3.NUM_MODULES", "1",
    "MODEL.EXTRA.STAGE4.NUM_MODULES", "1",
    "MODEL.CONDITIONAL_TOPDOWN", "True", "DATASET.COLORED", "True",
    "WORKERS", "2", "PRINT_FREQ", "1",
]


def _run(script, tmp_path, ann_file, extra):
    env = dict(os.environ,
               XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
               + " --xla_force_host_platform_device_count=8",
               BUCTD_FORCE_CPU="1")
    cmd = [sys.executable, os.path.join(REPO, "tools", script),
           "--cfg", os.path.join(REPO, "experiments/coco/hrnet/w32_384x288_adam_lr1e-3.yaml"),
           *extra,
           "OUTPUT_DIR", str(tmp_path / "out"), "LOG_DIR", str(tmp_path / "log"),
           "DATASET.TRAIN_IMAGE_DIR", str(tmp_path),
           "DATASET.TRAIN_ANNOTATION_FILE", ann_file,
           "DATASET.TEST_IMAGE_DIR", str(tmp_path),
           "DATASET.TEST_ANNOTATION_FILE", ann_file,
           *TINY_OPTS]
    return subprocess.run(cmd, capture_output=True, text=True, env=env,
                          cwd=os.path.join(REPO, "tools"), timeout=900)


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    ann_file, _ = _tiny_coco(tmp_path)
    r = _run("train.py", tmp_path, ann_file, [
        "TRAIN.END_EPOCH", "2", "TRAIN.BATCH_SIZE_PER_GPU", "4",
        "TEST.BATCH_SIZE_PER_GPU", "4", "EPOCH_EVAL_FREQ", "2",
        "DATASET.SYNTHESIS_POSE", "True", "TRAIN.USE_BU_BBOX", "True",
        "TEST.USE_BU_BBOX", "True", "TEST.USE_GT_BBOX", "False",
        "TEST.FLIP_TEST", "True", "TEST.POST_PROCESS", "True",
        "TPU.DEVICE_PIPELINE", "True",  # train via the all-on-device loader
    ])
    assert r.returncode == 0, r.stderr[-4000:]
    out_dir = tmp_path / "out" / "coco" / "pose_hrnet" / "w32_384x288_adam_lr1e-3"
    assert (out_dir / "final_state").exists()
    # results json written by the epoch-end eval
    res = list((out_dir / "results").glob("*.json"))
    assert res, "no results json written"
    assert json.loads(res[0].read_text())


@pytest.mark.slow
def test_test_cli_with_refinement(tmp_path):
    ann_file, _ = _tiny_coco(tmp_path)
    r = _run("test.py", tmp_path, ann_file, [
        "TEST.BATCH_SIZE_PER_GPU", "4", "TEST.USE_BU_BBOX", "True",
        "TEST.USE_GT_BBOX", "False", "TEST.FLIP_TEST", "True",
        "TEST.POST_PROCESS", "True", "TEST.REFINE_ITERS", "2",
        "DATASET.SYNTHESIS_POSE", "False",
    ])
    assert r.returncode == 0, r.stderr[-4000:]
    out_dir = tmp_path / "out" / "coco" / "pose_hrnet" / "w32_384x288_adam_lr1e-3"
    res0 = out_dir / "results" / "keypoints_test_results_epoch0.json"
    res1 = out_dir / "results" / "keypoints_test_results_epoch1.json"
    assert res0.exists() and res1.exists(), r.stderr[-2000:]
    assert "refinement round 1" in r.stderr + r.stdout


@pytest.mark.slow
def test_test_cli_device_pipeline(tmp_path):
    """tools/test.py with TPU.DEVICE_PIPELINE: the eval DeviceLoader path
    (host decodes, TPU warps/renders) produces a results json end-to-end."""
    ann_file, _ = _tiny_coco(tmp_path)
    r = _run("test.py", tmp_path, ann_file, [
        "TEST.BATCH_SIZE_PER_GPU", "4", "TEST.USE_BU_BBOX", "True",
        "TEST.USE_GT_BBOX", "False", "TEST.FLIP_TEST", "True",
        "TEST.POST_PROCESS", "True", "DATASET.SYNTHESIS_POSE", "False",
        "TPU.DEVICE_PIPELINE", "True",
    ])
    assert r.returncode == 0, r.stderr[-4000:]
    out_dir = tmp_path / "out" / "coco" / "pose_hrnet" / "w32_384x288_adam_lr1e-3"
    res = out_dir / "results" / "keypoints_test_results_epoch0.json"
    assert res.exists(), r.stderr[-2000:]
    assert json.loads(res.read_text())


@pytest.mark.slow
def test_train_cli_cutmix(tmp_path):
    """TRAIN.MIX=cutmix drives the on-device mixed double-target step end-to-end."""
    ann_file, _ = _tiny_coco(tmp_path)
    r = _run("train.py", tmp_path, ann_file, [
        "TRAIN.END_EPOCH", "1", "TRAIN.BATCH_SIZE_PER_GPU", "4",
        "TEST.BATCH_SIZE_PER_GPU", "4", "EPOCH_EVAL_FREQ", "1",
        "DATASET.SYNTHESIS_POSE", "False", "TRAIN.USE_BU_BBOX", "True",
        "TEST.USE_BU_BBOX", "True", "TEST.USE_GT_BBOX", "False",
        "TRAIN.MIX", "cutmix", "TRAIN.MIX_ALPHA", "1.0",
    ])
    assert r.returncode == 0, r.stderr[-4000:]
    assert "cutmix training" in r.stderr + r.stdout
    out_dir = tmp_path / "out" / "coco" / "pose_hrnet" / "w32_384x288_adam_lr1e-3"
    assert (out_dir / "final_state").exists()


@pytest.mark.slow
def test_test_cli_lambda_sweep(tmp_path):
    """TEST.LAMBDA_SWEEP runs the λ∈{0,1} double eval + oks_merge evaluation."""
    ann_file, _ = _tiny_coco(tmp_path)
    r = _run("test.py", tmp_path, ann_file, [
        "TEST.BATCH_SIZE_PER_GPU", "4", "TEST.USE_BU_BBOX", "True",
        "TEST.USE_GT_BBOX", "False", "TEST.FLIP_TEST", "True",
        "TEST.POST_PROCESS", "True", "TEST.LAMBDA_SWEEP", "True",
        "DATASET.SYNTHESIS_POSE", "False",
    ])
    assert r.returncode == 0, r.stderr[-4000:]
    out_dir = tmp_path / "out" / "coco" / "pose_hrnet" / "w32_384x288_adam_lr1e-3"
    res = out_dir / "results"
    for suffix in ("l0", "l1", "merged"):
        assert (res / f"keypoints_test_results_epoch0_{suffix}.json").exists(), \
            r.stderr[-2000:]
    assert "l0,1:" in r.stderr + r.stdout


@pytest.mark.slow
def test_parity_eval_cli_smoke(tmp_path):
    """tools/parity_eval.py: .pth conversion + full protocol + verdict table on
    the synthetic tiny COCO (the real-data north-star runner, VERDICT r2 #6)."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_torch_parity import _cfg as _ref_cfg  # torchvision stub + ref path
    import models.pose_hrnet as ref_hrnet

    tiny = ["MODEL.IMAGE_SIZE", "[96, 128]", "MODEL.HEATMAP_SIZE", "[24, 32]",
            "MODEL.EXTRA.STAGE2.NUM_MODULES", "1",
            "MODEL.EXTRA.STAGE3.NUM_MODULES", "1",
            "MODEL.EXTRA.STAGE4.NUM_MODULES", "1"]
    tm = ref_hrnet.get_pose_net(_ref_cfg(opts=tiny), is_train=False)
    pth = tmp_path / "ref.pth"
    torch.save({"latest_state_dict": tm.state_dict()}, str(pth))

    ann_file, _ = _tiny_coco(tmp_path)
    # plain (non-conditional) protocol: the reference's eval _get_db ALWAYS
    # reads the detector-box pickle when not (USE_BU_BBOX && CONDITIONAL),
    # regardless of USE_GT_BBOX (reference dataloader.py:110-124) — build one
    import pickle

    import numpy as np
    dets = [[np.array([[30.0, 25.0, 150.0, 200.0, 0.95],
                       [160.0, 25.0, 280.0, 200.0, 0.90]])]
            for _ in range(2)]                                  # 2 images
    bbox_pkl = tmp_path / "dets.pkl"
    with open(bbox_pkl, "wb") as f:
        pickle.dump(dets, f)
    env = dict(os.environ,
               XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
               + " --xla_force_host_platform_device_count=8",
               BUCTD_FORCE_CPU="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/parity_eval.py"),
         "--cfg", os.path.join(REPO, "experiments/coco/hrnet/w32_384x288_adam_lr1e-3.yaml"),
         "--pth", str(pth), "--ann", ann_file, "--img-dir", str(tmp_path),
         "--out", str(tmp_path / "parity"), "--expected-ap", "50.0",
         *tiny, "LOG_DIR", str(tmp_path / "log"),
         "TEST.BATCH_SIZE_PER_GPU", "4",
         "TEST.COCO_BBOX_FILE", str(bbox_pkl),
         "WORKERS", "2", "MODEL.CONDITIONAL_TOPDOWN", "False"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900)
    assert r.returncode in (0, 1), r.stderr[-4000:]
    assert "| dataset | model |" in r.stdout, r.stdout[-2000:]
    verdict = json.loads(r.stdout.strip().splitlines()[-1])
    assert {"ap", "expected", "delta", "pass", "refine_trajectory"} <= set(verdict)
    assert verdict["refine_trajectory"] == [verdict["ap"]]   # 1 round here


@pytest.mark.slow
def test_convert_cli_roundtrip(tmp_path):
    """tools/convert.py: torch .pth -> orbax -> load -> output parity."""
    import numpy as np
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_torch_parity import _cfg  # torchvision stub + reference path
    import models.pose_hrnet as ref_hrnet

    tiny = ["MODEL.IMAGE_SIZE", "[96, 128]", "MODEL.HEATMAP_SIZE", "[24, 32]",
            "MODEL.EXTRA.STAGE2.NUM_MODULES", "1",
            "MODEL.EXTRA.STAGE3.NUM_MODULES", "1",
            "MODEL.EXTRA.STAGE4.NUM_MODULES", "1"]
    cfg = _cfg(opts=tiny)
    tm = ref_hrnet.get_pose_net(cfg, is_train=False)
    tm.eval()
    pth = tmp_path / "m.pth"
    torch.save({"latest_state_dict": tm.state_dict()}, str(pth))

    env = dict(os.environ, BUCTD_FORCE_CPU="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/convert.py"),
         "--cfg", "/root/reference/experiments/coco/hrnet/w32_384x288_adam_lr1e-3.yaml",
         "--torch", str(pth), "--out", str(tmp_path / "conv"), *tiny],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    import jax
    import jax.numpy as jnp
    from buctd_tpu.models import get_model
    from buctd_tpu.train.checkpoint import load_params
    fm = get_model(cfg)
    tmpl = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 96, 3)), train=False)
    v = load_params(str(tmp_path / "conv"), template=tmpl)
    x = np.random.RandomState(0).randn(2, 128, 96, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(fm.apply(v, x, train=False)).transpose(0, 3, 1, 2)
    assert np.abs(got - want).max() / (np.abs(want).max() + 1e-12) < 2e-3


@pytest.mark.slow
def test_serve_cli(tmp_path):
    """tools/serve.py: manifest in -> batched predictions JSON out."""
    import cv2

    rng = np.random.RandomState(0)
    entries = []
    for i in range(3):
        img = rng.randint(0, 255, (160 + 10 * i, 200, 3)).astype(np.uint8)
        path = str(tmp_path / f"img{i}.jpg")
        cv2.imwrite(path, img)
        poses = rng.uniform(30, 120, (2, 17, 3))
        poses[:, :, 2] = 1.0
        entries.append({"image": path, "poses": poses.tolist()})
    manifest = tmp_path / "manifest.json"
    manifest.write_text(json.dumps(entries))
    out = tmp_path / "results.json"

    env = dict(os.environ,
               XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
               + " --xla_force_host_platform_device_count=8",
               BUCTD_FORCE_CPU="1")
    cmd = [sys.executable, os.path.join(REPO, "tools", "serve.py"),
           "--cfg", os.path.join(REPO, "experiments/coco/hrnet/w32_384x288_adam_lr1e-3.yaml"),
           "--manifest", str(manifest), "--out", str(out),
           *TINY_OPTS]
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=os.path.join(REPO, "tools"), timeout=900)
    assert r.returncode == 0, r.stderr[-4000:]
    got = json.loads(out.read_text())
    assert len(got) == 3
    for e in got:
        preds = np.asarray(e["predictions"], dtype=object)
        assert preds.shape[:3] == (2, 17, 3)
    assert "served 3 images" in r.stdout
