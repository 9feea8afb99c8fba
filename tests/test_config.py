"""Config-system tests: yacs-compatible surface incl. reference YAML + CLI overrides."""

import types

import pytest

from buctd_tpu.config import default_config, update_config


def test_defaults_match_reference_schema():
    cfg = default_config()
    assert cfg.MODEL.NAME == "pose_hrnet"
    assert cfg.MODEL.NUM_JOINTS == 17
    assert cfg.MODEL.IMAGE_SIZE == [256, 256]
    assert cfg.TEST.SCALE_THRE == 1.25
    assert cfg.DATASET.BU_BBOX_MARGIN == 25
    assert cfg.MODEL.ATT_MODULES == [False, False, True, True]


def test_merge_from_list_types():
    cfg = default_config()
    cfg.merge_from_list([
        "MODEL.NAME", "pose_hrnet_coam",
        "MODEL.ATT_MODULES", "[False, True, False, False]",
        "TRAIN.BATCH_SIZE_PER_GPU", "32",
        "DATASET.COLORED", "True",
        "TEST.FLIP_TEST", "False",
        "TRAIN.LR", "0.001",
    ])
    assert cfg.MODEL.NAME == "pose_hrnet_coam"
    assert cfg.MODEL.ATT_MODULES == [False, True, False, False]
    assert cfg.TRAIN.BATCH_SIZE_PER_GPU == 32
    assert cfg.DATASET.COLORED is True
    assert cfg.TEST.FLIP_TEST is False
    assert isinstance(cfg.TRAIN.LR, float)


def test_model_extra_new_allowed():
    cfg = default_config()
    cfg.merge_from_list(["MODEL.EXTRA.USE_ATTENTION", "True"])
    assert cfg.MODEL.EXTRA.USE_ATTENTION is True


def test_unknown_key_raises():
    cfg = default_config()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["MODEL.NO_SUCH_KEY", "1"])


def test_freeze():
    cfg = default_config()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.NAME = "x"
    cfg.defrost()
    cfg.MODEL.NAME = "x"
    assert cfg.MODEL.NAME == "x"


def test_reference_yaml_loads(tmp_path):
    """The reference's shipped experiment YAML must merge cleanly."""
    import shutil

    src = "/root/reference/experiments/coco/hrnet/w48_384x288_adam_lr1e-3.yaml"
    yaml_path = tmp_path / "w48.yaml"
    shutil.copy(src, yaml_path)
    cfg = default_config()
    args = types.SimpleNamespace(cfg=str(yaml_path), opts=[], modelDir="", logDir="", dataDir="")
    update_config(cfg, args)
    assert cfg.MODEL.IMAGE_SIZE == [288, 384]
    assert cfg.MODEL.HEATMAP_SIZE == [72, 96]
    assert cfg.MODEL.EXTRA.STAGE4.NUM_CHANNELS == [48, 96, 192, 384]
    assert cfg.MODEL.SIGMA == 3
    assert cfg.TRAIN.LR_STEP == [170, 200]
    assert cfg.is_frozen()


def test_clone_independent():
    cfg = default_config()
    c2 = cfg.clone()
    c2.MODEL.NAME = "other"
    assert cfg.MODEL.NAME == "pose_hrnet"
