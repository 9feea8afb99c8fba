"""Default config tree.

Mirrors the reference's yacs schema (lib/config/default.py:17-178) key-for-key so the
reference's experiment YAMLs and ``KEY value`` CLI override lists work unchanged, plus a
``TPU`` section for mesh/precision knobs that the reference (single-node PyTorch) lacks.
"""

from __future__ import annotations

import os

from .node import CfgNode as CN


def default_config() -> CN:
    _C = CN()

    _C.OUTPUT_DIR = ""
    _C.LOG_DIR = ""
    _C.DATA_DIR = ""
    _C.GPUS = (0,)
    _C.WORKERS = 4
    _C.PRINT_FREQ = 20
    _C.AUTO_RESUME = False
    _C.PIN_MEMORY = True
    _C.RANK = 0
    _C.EPOCH_EVAL_FREQ = 10

    # kept for YAML compatibility with the reference; unused on TPU
    _C.CUDNN = CN()
    _C.CUDNN.BENCHMARK = True
    _C.CUDNN.DETERMINISTIC = False
    _C.CUDNN.ENABLED = True

    _C.MODEL = CN()
    _C.MODEL.NAME = "pose_hrnet"
    _C.MODEL.INIT_WEIGHTS = True
    _C.MODEL.PRETRAINED = ""
    _C.MODEL.NUM_JOINTS = 17
    _C.MODEL.TAG_PER_JOINT = True
    _C.MODEL.TARGET_TYPE = "gaussian"
    _C.MODEL.IMAGE_SIZE = [256, 256]  # width, height
    _C.MODEL.HEATMAP_SIZE = [64, 64]  # width, height
    _C.MODEL.SIGMA = 2
    _C.MODEL.EXTRA = CN(new_allowed=True)
    _C.MODEL.ATT_MODULES = [False, False, True, True]
    _C.MODEL.ATT_CHANNEL_ONLY = False
    _C.MODEL.ATTENTION_HEADS = 1
    _C.MODEL.SELFATT_MODULES = [False, False, False, False]
    _C.MODEL.CONDITIONAL_TOPDOWN = False

    # transformer (TransPose) keys
    _C.MODEL.DIM_MODEL = 96
    _C.MODEL.DIM_FEEDFORWARD = 192
    _C.MODEL.N_HEAD = 1
    _C.MODEL.ENCODER_LAYERS = 6
    _C.MODEL.ATTENTION_ACTIVATION = "relu"
    _C.MODEL.POS_EMBEDDING = "sine"

    _C.LOSS = CN()
    _C.LOSS.USE_OHKM = False
    _C.LOSS.TOPK = 8
    _C.LOSS.USE_TARGET_WEIGHT = True
    _C.LOSS.USE_DIFFERENT_JOINTS_WEIGHT = False

    _C.DATASET = CN()
    _C.DATASET.DATASET = "coco"
    _C.DATASET.ROOT = ""

    _C.DATASET.TRAIN_SET = "train"
    _C.DATASET.TRAIN_IMAGE_DIR = ""
    _C.DATASET.TRAIN_ANNOTATION_FILE = "train2017.json"

    _C.DATASET.TEST_SET = "valid"
    _C.DATASET.TEST_IMAGE_DIR = ""
    _C.DATASET.TEST_ANNOTATION_FILE = "val2017.json"

    _C.DATASET.COND_FILE = "full_pickle.pickle"

    _C.DATASET.SYNTHESIS_POSE = False
    _C.DATASET.SWAP_OVERLAP = 0.0

    _C.DATASET.DATA_FORMAT = "jpg"
    _C.DATASET.HYBRID_JOINTS_TYPE = ""
    _C.DATASET.SELECT_DATA = False

    _C.DATASET.SYNTHETIC_DATASET = "synthetic"
    _C.DATASET.SYNTHETIC_ROOT = ""
    _C.DATASET.SYNTHETIC_TRAIN_DATASET = "synthetic"
    _C.DATASET.SYNTHETIC_TRAIN_SET = "train"
    _C.DATASET.SYNTHETIC_TRAIN_IMAGE_DIR = ""
    _C.DATASET.SYNTHETIC_TRAIN_ANNOTATION_FILE = "train2017.json"
    _C.DATASET.SYNTHETIC_TRAIN_DATASET_TYPE = "coco_lambda_syn"
    _C.DATASET.SYNTHETIC_TEST_DATASET = "synthetic"
    _C.DATASET.SYNTHETIC_TEST_SET = "valid"
    _C.DATASET.SYNTHETIC_TEST_IMAGE_DIR = ""
    _C.DATASET.SYNTHETIC_TEST_ANNOTATION_FILE = "val2017.json"
    _C.DATASET.SYNTHETIC_TEST_DATASET_TYPE = "coco_lambda_syn"

    # training-time augmentation
    _C.DATASET.FLIP = True
    _C.DATASET.SCALE_FACTOR = 0.25
    _C.DATASET.ROT_FACTOR = 30
    _C.DATASET.PROB_HALF_BODY = 0.0
    _C.DATASET.NUM_JOINTS_HALF_BODY = 8
    _C.DATASET.COLOR_RGB = False
    _C.DATASET.BALANCED = False
    _C.DATASET.COLORED = False
    _C.DATASET.NEW_AUGMENTATION = True
    _C.DATASET.BBOX_AUGMENTATION = False
    _C.DATASET.STACKED_CONDITION = False
    _C.DATASET.BU_BBOX_MARGIN = 25
    _C.DATASET.USE_COND_FILTER = False

    _C.TRAIN = CN()
    _C.TRAIN.LR_FACTOR = 0.1
    _C.TRAIN.LR_STEP = [90, 110]
    _C.TRAIN.LR = 0.001
    _C.TRAIN.OPTIMIZER = "adam"
    _C.TRAIN.MOMENTUM = 0.9
    _C.TRAIN.WD = 0.0001
    _C.TRAIN.NESTEROV = False
    _C.TRAIN.GAMMA1 = 0.99
    _C.TRAIN.GAMMA2 = 0.0
    _C.TRAIN.BEGIN_EPOCH = 0
    _C.TRAIN.END_EPOCH = 140
    _C.TRAIN.RESUME = False
    _C.TRAIN.CHECKPOINT = ""
    _C.TRAIN.BATCH_SIZE_PER_GPU = 32
    _C.TRAIN.SHUFFLE = True
    _C.TRAIN.USE_BU_BBOX = True
    # cutmix/mixup double-target training (reference lib/core/train.py:179-343;
    # its MIPNet-era loops had no cfg keys — the mixed loader lived outside the
    # repo — so these knobs are ours): '' | 'cutmix' | 'mixup', Beta(α, α) draw.
    _C.TRAIN.MIX = ""
    _C.TRAIN.MIX_ALPHA = 1.0
    # gradient accumulation (ours): average k micro-batch grads into one
    # optimizer step (optax.MultiSteps) — effective batch = k x BATCH_SIZE_PER_GPU
    # x mesh size on memory-constrained chips.  LR milestones see optimizer steps.
    _C.TRAIN.GRAD_ACCUM_STEPS = 1

    _C.TEST = CN()
    _C.TEST.BATCH_SIZE_PER_GPU = 32
    _C.TEST.FLIP_TEST = False
    _C.TEST.POST_PROCESS = False
    _C.TEST.SHIFT_HEATMAP = False
    _C.TEST.USE_GT_BBOX = False
    _C.TEST.USE_BU_BBOX = True
    _C.TEST.IMAGE_THRE = 0.1
    _C.TEST.NMS_THRE = 0.6
    _C.TEST.SOFT_NMS = False
    _C.TEST.OKS_THRE = 0.5
    _C.TEST.IN_VIS_THRE = 0.0
    _C.TEST.COCO_BBOX_FILE = ""
    _C.TEST.BBOX_THRE = 1.0
    _C.TEST.MODEL_FILE = ""
    _C.TEST.BBOX_FRACTION = 1.0
    _C.TEST.DECAY_THRE = 0.5
    # run the legacy λ∈{0,1} sweep (validate_lambda_quantitative) instead of the
    # plain validate loop; ours only — the reference never plumbs it to a CLI
    _C.TEST.LAMBDA_SWEEP = False
    _C.TEST.SCALE_THRE = 1.25
    _C.TEST.USE_DARK = False
    _C.TEST.REFINE_ITERS = 1  # 3x iterative refinement as an in-process loop

    _C.DEBUG = CN()
    _C.DEBUG.DEBUG = False
    _C.DEBUG.SAVE_BATCH_IMAGES_GT = False
    _C.DEBUG.SAVE_BATCH_IMAGES_PRED = False
    _C.DEBUG.SAVE_HEATMAPS_GT = False
    _C.DEBUG.SAVE_HEATMAPS_PRED = False
    # per-IoU-bin pred dumps (reference vis.py:206-266, shipped commented out
    # there at :436-438; here an explicit opt-in flag)
    _C.DEBUG.SAVE_IOU_BIN_PRED = False

    _C.OUTPUT_JSON = None

    # --- TPU-native section (no reference counterpart) ----------------------
    _C.TPU = CN()
    _C.TPU.MESH_SHAPE = [-1]        # -1 = all visible devices on the 'data' axis
    _C.TPU.MESH_AXES = ["data"]
    _C.TPU.COMPUTE_DTYPE = "bfloat16"   # training compute
    _C.TPU.EVAL_DTYPE = "float32"       # tools/test.py: AP parity needs f32 argmax
    _C.TPU.PARAM_DTYPE = "float32"
    _C.TPU.DONATE_STATE = True
    _C.TPU.REMAT = False
    # 'modules' (default — REMAT=True means "make it fit"): checkpoint
    # stem+layer1 and each HRModule as units; the only granularity measured
    # to fit b192+ (costs 1.5-2x per-crop).  'stem': ONLY preNet+stem+layer1
    # (5% tax; enough when the layer1 giants are the overage).  'blocks': per
    # residual block (does NOT lower the HRNet peak — the boundary tensors
    # dominate).  'forward': legacy whole-forward jax.checkpoint (does not
    # lower it either).  See models/hrnet.py::_maybe_remat and PERF.md.
    _C.TPU.REMAT_MODE = "modules"
    # run warp/render/target on-device per batch (data/device_pipeline.py) instead
    # of per-sample cv2 on the host
    _C.TPU.DEVICE_PIPELINE = False
    # rotated-warp engine for the device pipeline: 'auto' (pallas on TPU —
    # measured 6% faster than matmul on v5e — matmul elsewhere), 'matmul'
    # (banded-matmul, HBM weight tensors), 'pallas' (on-the-fly VMEM weights)
    _C.TPU.WARP_ENGINE = "auto"
    # run the generative condition sampler (DATASET.SYNTHESIS_POSE) as one
    # batched jit on the accelerator instead of ~97 ms/sample host numpy
    # (data/pose_synthesis_jax.py); distributionally identical
    _C.TPU.DEVICE_SYNTHESIS = False
    # long-sequence token attention (CoAM position attn, TransPose encoder):
    # 'auto' = pallas flash kernel (ops/flash_attention.py) on TPU for
    # L_q*L_k >= 512^2, mapped 2-D GEMMs elsewhere; 'flash'/'mapped' force
    _C.TPU.ATTENTION_ENGINE = "auto"
    # background staging depth for the train/eval loops (utils/prefetch.py):
    # batch i+1's host work + device transfer overlap step i.  0 = synchronous.
    _C.TPU.PREFETCH = 2
    # eval-time exact preNet fusion (models/fuse.py): BNs folded into conv
    # weights + the two parallel 7x7 stems merged into one conv.  Default OFF:
    # measured on chip (tools/bench_stem.py, round 4) the fusion is a wash on
    # the stem (0.99-1.00x) and NEGATIVE end-to-end (-0.7% at b256, -3.2% at
    # b384) — XLA's conv emitter handles the three thin convs as well as one
    # fat one, and the 67-channel concat adds traffic.  'auto'/'on' = fuse
    # wherever maybe_fuse_prenet is wired (tools/test.py, serving,
    # tools/inference.py, bench.py); kept as an opt-in knob.
    _C.TPU.FUSED_PRENET = "off"
    # run the optimizer update in flattened-parameter space (train/state.py::
    # _fused_flat): HRNet's ~1000 leaves looked like an epilogue of ~1000 tiny
    # fusions, but the on-chip A/B (tools/bench_fused_opt.py, PERF.md round 4)
    # measured the flat form 6.5 ms/step SLOWER at b128 — the ravel/unravel
    # concatenate traffic costs more than the per-leaf overhead it removes.
    # Default off; kept as a knob with a math-parity test (test_train.py).
    _C.TPU.FUSED_OPTIMIZER = False

    return _C


def update_config(cfg: CN, args) -> None:
    """Merge YAML file + CLI opts, matching lib/config/default.py:180-207."""
    cfg.defrost()
    if getattr(args, "cfg", None):
        cfg.merge_from_file(args.cfg)
    cfg.merge_from_list(list(getattr(args, "opts", []) or []))

    if getattr(args, "modelDir", None):
        cfg.OUTPUT_DIR = args.modelDir
    if getattr(args, "logDir", None):
        cfg.LOG_DIR = args.logDir
    if getattr(args, "dataDir", None):
        cfg.DATA_DIR = args.dataDir

    cfg.DATASET.ROOT = os.path.join(cfg.DATA_DIR, cfg.DATASET.ROOT)
    cfg.MODEL.PRETRAINED = os.path.join(cfg.DATA_DIR, cfg.MODEL.PRETRAINED)
    if cfg.TEST.MODEL_FILE:
        cfg.TEST.MODEL_FILE = os.path.join(cfg.DATA_DIR, cfg.TEST.MODEL_FILE)
    cfg.freeze()
