"""CLI end-to-end for the non-flagship families: Mask R-CNN (MASK_ON),
Keypoint R-CNN (KEYPOINT_ON) and Faster R-CNN R-50-FPN driven through the
ACTUAL tools (train_first_step.py → eval), exactly like the reference's
family-agnostic tool surface (reference tools/train_first_step.py:159-235,
modeling/roi_heads/mask_head/mask_head.py:81-86) — plus fast-tier loader
coverage for the keypoint target plane.

The mask/keypoint families consume COCO-json synthetic sets
(data/synthetic.make_synthetic_coco) through the same catalog indirection
the reference's json-backed configs use.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_COMMON = {
    "MODEL": {
        "META_ARCHITECTURE": "GeneralizedRCNN",
        "RESNETS": {"WIDTH_PER_GROUP": 8, "RES2_OUT_CHANNELS": 16},
        "RPN": {"ANCHOR_SIZES": [16, 32, 64], "ASPECT_RATIOS": [1.0]},
        "ROI_HEADS": {"BATCH_SIZE_PER_IMAGE": 16},
    },
    "INPUT": {
        "MIN_SIZE_TRAIN": [96], "MAX_SIZE_TRAIN": 128,
        "MIN_SIZE_TEST": 96, "MAX_SIZE_TEST": 128,
    },
    "SOLVER": {
        "MAX_ITER": 3, "IMS_PER_BATCH": 2, "CHECKPOINT_PERIOD": 100,
        "BASE_LR": 0.001, "WARMUP_ITERS": 0,
    },
    "TEST": {"IMS_PER_BATCH": 2},
    "TPU": {
        "CANVAS_TRAIN": [96, 128], "CANVAS_TEST": [96, 128], "MAX_GT": 8,
        "PRE_NMS_TOP_N_TRAIN": 64, "POST_NMS_TOP_N_TRAIN": 32,
        "PRE_NMS_TOP_N_TEST": 64, "POST_NMS_TOP_N_TEST": 32,
        "BACKBONE_STAGES": [1, 1, 1], "RES5_BLOCKS": 1,
        "RES5_BOTTLENECK": 16, "RES5_OUT": 32,
        "COMPUTE_DTYPE": "float32",
        "EVAL_NMS_PER_CLASS_TOPK": 20,
    },
}


def _deep_merge(a, b):
    out = dict(a)
    for k, v in b.items():
        out[k] = _deep_merge(out[k], v) if isinstance(v, dict) and k in out else v
    return out


def _run(workdir, *cmd):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        ABR_IOD_DATA_DIR=str(workdir / "datasets"),
        ABR_IOD_SYNTH_IMAGES="8",
        ABR_IOD_SYNTH_H="240",
        ABR_IOD_SYNTH_W="320",
        PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
    )
    proc = subprocess.run(
        [sys.executable, *cmd], cwd=str(workdir), env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, f"cmd {cmd} failed:\n{proc.stdout}\n{proc.stderr}"
    return proc


def _train_and_eval(tmp_path, cfg_dict, name):
    cfg_path = tmp_path / f"{name}.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg_dict))
    _run(tmp_path, os.path.join(REPO, "tools", "train_first_step.py"),
         "-c", str(cfg_path))
    out = tmp_path / cfg_dict["OUTPUT_DIR"]
    assert (out / "model_final.msgpack").exists()
    assert (out / "result.txt").exists(), "eval did not produce result.txt"
    log = (out / "log.txt").read_text()
    return out, log


@pytest.mark.slow
def test_cli_mask_family(tmp_path):
    """Mask R-CNN (C4 + mask branch) through the real CLI on a COCO-json
    instance-seg synthetic set: converging train step with loss_mask in the
    meter, eval with the VOC instance protocol (voc_eval_inst)."""
    cfg = _deep_merge(TINY_COMMON, {
        "MODEL": {
            "MASK_ON": True,
            "ROI_MASK_HEAD": {"CONV_LAYERS": [8, 8]},
            "ROI_BOX_HEAD": {
                "NUM_CLASSES": 4,
                "NAME_OLD_CLASSES": [],
                "NAME_NEW_CLASSES": ["apple", "ball", "cat"],
                "NAME_EXCLUDED_CLASSES": [],
            },
        },
        "DATASETS": {"TRAIN": ["instseg_synthetic_train"],
                     "TEST": ["instseg_synthetic_test"]},
        "OUTPUT_DIR": "output/mask_tiny",
    })
    out, log = _train_and_eval(tmp_path, cfg, "mask")
    assert "loss_mask" in log, "mask branch not in the compiled train step"
    assert "instance-seg mAP" in log, "voc_eval_inst protocol did not run"


@pytest.mark.slow
def test_cli_keypoint_family(tmp_path):
    """Keypoint R-CNN (C4 + 17-keypoint branch) through the real CLI on a
    COCO-json person-keypoints synthetic set: loss_kp in the meter, eval
    decodes heatmaps into per-detection keypoints."""
    cfg = _deep_merge(TINY_COMMON, {
        "MODEL": {
            "KEYPOINT_ON": True,
            "ROI_KEYPOINT_HEAD": {"CONV_LAYERS": [16, 16]},
            "ROI_BOX_HEAD": {
                "NUM_CLASSES": 2,
                "NAME_OLD_CLASSES": [],
                "NAME_NEW_CLASSES": ["person"],
                "NAME_EXCLUDED_CLASSES": [],
            },
        },
        "DATASETS": {"TRAIN": ["keypoints_synthetic_train"],
                     "TEST": ["keypoints_synthetic_test"]},
        "OUTPUT_DIR": "output/kp_tiny",
    })
    out, log = _train_and_eval(tmp_path, cfg, "keypoint")
    assert "loss_kp" in log, "keypoint branch not in the compiled train step"


@pytest.mark.slow
def test_cli_fpn_family(tmp_path):
    """Faster R-CNN R-50-FPN through the real CLI on synthetic VOC: the
    multi-level proposal path (per-level top-N + NMS fold) end-to-end."""
    cfg = _deep_merge(TINY_COMMON, {
        "MODEL": {
            "BACKBONE": {"CONV_BODY": "R-50-FPN"},
            "RESNETS": {"WIDTH_PER_GROUP": 8, "RES2_OUT_CHANNELS": 16,
                        "BACKBONE_OUT_CHANNELS": 16},
            "RPN": {"ANCHOR_SIZES": [8, 16, 32, 64, 128],
                    "ASPECT_RATIOS": [0.5, 1.0, 2.0],
                    "FPN_POST_NMS_TOP_N_TRAIN": 32,
                    "FPN_POST_NMS_TOP_N_TEST": 32},
            "ROI_BOX_HEAD": {
                "MLP_HEAD_DIM": 32,
                "NUM_CLASSES": 21,
                "NAME_OLD_CLASSES": [],
                "NAME_NEW_CLASSES": [
                    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
                    "car", "cat", "chair", "cow", "diningtable", "dog",
                    "horse", "motorbike", "person", "pottedplant", "sheep",
                    "sofa", "train", "tvmonitor",
                ],
                "NAME_EXCLUDED_CLASSES": [],
            },
        },
        # P6 stride 64: canvas must be 64-divisible
        "INPUT": {"MIN_SIZE_TRAIN": [96], "MAX_SIZE_TRAIN": 128,
                  "MIN_SIZE_TEST": 96, "MAX_SIZE_TEST": 128},
        "TPU": {"CANVAS_TRAIN": [128, 128], "CANVAS_TEST": [128, 128],
                "FPN_BACKBONE_STAGES": [1, 1, 1, 1]},
        "DATASETS": {"TRAIN": ["voc_rb_synthetic_train"],
                     "TEST": ["voc_synthetic_test"]},
        "OUTPUT_DIR": "output/fpn_tiny",
    })
    out, log = _train_and_eval(tmp_path, cfg, "fpn")
    assert "mAP" in log


# ---------------------------------------------------------------- fast tier
def test_loader_keypoint_targets(tmp_path):
    """DetectionLoader emits [B, MAX_GT, K, 3] canvas-coordinate keypoint
    targets: scaled like the boxes, visible points inside their instance
    box, zero rows beyond the gt count."""
    from abr_iod_tpu.config import get_default_config
    from abr_iod_tpu.data.coco import COCODataSource
    from abr_iod_tpu.data.loader import DetectionLoader
    from abr_iod_tpu.data.synthetic import make_synthetic_coco

    root = str(tmp_path / "kp")
    make_synthetic_coco(root, n_images=4, keypoints=True,
                        categories=("person",), splits=("train",))
    src = COCODataSource(os.path.join(root, "ann_train.json"),
                         os.path.join(root, "img"),
                         is_train=True, num_old_categories=0,
                         num_new_categories=1, contiguous_labels=True)
    assert len(src) == 4
    rec = src.annotation(0)
    assert rec["keypoints"].shape == (len(rec["boxes"]), 17, 3)

    cfg = get_default_config()
    cfg.MODEL.KEYPOINT_ON = True
    cfg.INPUT.MIN_SIZE_TRAIN = (96,)
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.TPU.CANVAS_TRAIN = (96, 128)
    cfg.TPU.MAX_GT = 8
    loader = DetectionLoader(src, cfg, batch_size=2, is_train=True,
                             flip=False, normalize=False)
    batch = next(iter(loader.batches(max_batches=1)))
    kps = batch.gt_keypoints
    assert kps.shape == (2, 8, 17, 3)
    for i in range(2):
        n = int(batch.gt_mask[i].sum())
        for j in range(n):
            x1, y1, x2, y2 = batch.gt_boxes[i, j]
            vis = kps[i, j, :, 2] > 0
            assert vis.any()
            assert np.all(kps[i, j, vis, 0] >= x1 - 1e-3)
            assert np.all(kps[i, j, vis, 0] <= x2 + 1e-3)
            assert np.all(kps[i, j, vis, 1] >= y1 - 1e-3)
            assert np.all(kps[i, j, vis, 1] <= y2 + 1e-3)
        # padding rows are zero
        assert np.all(kps[i, n:] == 0)


def test_loader_keypoint_flip(tmp_path):
    """Under hflip the keypoint targets mirror x and swap left/right
    indices while staying inside the flipped boxes."""
    from abr_iod_tpu.config import get_default_config
    from abr_iod_tpu.data.coco import COCODataSource
    from abr_iod_tpu.data.loader import DetectionLoader
    from abr_iod_tpu.data.synthetic import make_synthetic_coco
    from abr_iod_tpu.structures.keypoints import flip_inds

    root = str(tmp_path / "kpf")
    make_synthetic_coco(root, n_images=2, keypoints=True,
                        categories=("person",), splits=("train",))
    src = COCODataSource(os.path.join(root, "ann_train.json"),
                         os.path.join(root, "img"),
                         is_train=True, num_old_categories=0,
                         num_new_categories=1, contiguous_labels=True)
    cfg = get_default_config()
    cfg.MODEL.KEYPOINT_ON = True
    cfg.INPUT.MIN_SIZE_TRAIN = (96,)
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.TPU.CANVAS_TRAIN = (96, 128)
    cfg.TPU.MAX_GT = 8

    mk = lambda flip: DetectionLoader(src, cfg, batch_size=2, is_train=True,
                                      flip=flip, normalize=False)
    plain = next(iter(mk(False).batches(max_batches=1)))
    cfg.INPUT.FLIP_PROB_TRAIN = 1.0
    flipped = next(iter(mk(True).batches(max_batches=1)))
    inds = flip_inds()
    for i in range(2):
        w = float(plain.sizes[i, 1])
        n = int(plain.gt_mask[i].sum())
        a, b = plain.gt_keypoints[i, :n], flipped.gt_keypoints[i, :n]
        np.testing.assert_allclose(b[:, :, 0], w - a[:, inds, 0] - 1,
                                   atol=1e-3)
        np.testing.assert_allclose(b[:, :, 1], a[:, inds, 1], atol=1e-3)
