"""End-to-end CLI pipeline on synthetic VOC with a tiny model:
first-task training → Prototype Box Selection → ABR incremental step.

Exercises the same command surface as the reference's scripts
(run_firststep.sh → run_SI.sh) through real files on disk.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow  # compile-heavy tier: run with `pytest -m ""`

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
        "SOFTEN_TOPK": 16, "SOFTEN_KEEP": 8,
        "CROP_BANK_HW": [48, 48], "COMPUTE_DTYPE": "float32",
        "EVAL_NMS_PER_CLASS_TOPK": 20,
    },
}

FIRST_15 = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
]
LAST_5 = ["pottedplant", "sheep", "sofa", "train", "tvmonitor"]


def _deep_merge(a, b):
    out = dict(a)
    for k, v in b.items():
        out[k] = _deep_merge(out[k], v) if isinstance(v, dict) and k in out else v
    return out


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("cli")
    cfg_dir = wd / "configs" / "voc" / "15-5"
    cfg_dir.mkdir(parents=True)

    first = _deep_merge(TINY_COMMON, {
        "MODEL": {"ROI_BOX_HEAD": {
            "NUM_CLASSES": 16,
            "NAME_OLD_CLASSES": [], "NAME_NEW_CLASSES": FIRST_15,
            "NAME_EXCLUDED_CLASSES": LAST_5,
        }},
        "DATASETS": {"TRAIN": ["voc_rb_synthetic_train"],
                     "TEST": ["voc_synthetic_test"]},
        "OUTPUT_DIR": "output/15-5/LR005_BS4_FILOD",
    })
    (cfg_dir / "e2e_faster_rcnn_R_50_C4_4x.yaml").write_text(yaml.safe_dump(first))

    target = _deep_merge(TINY_COMMON, {
        "MODEL": {
            "WEIGHT": "output/15-5/LR005_BS4_FILOD/model_trimmed.msgpack",
            "SOURCE_WEIGHT": "output/15-5/LR005_BS4_FILOD/model_final.msgpack",
            "ROI_BOX_HEAD": {
                "NUM_CLASSES": 21,
                "NAME_OLD_CLASSES": FIRST_15, "NAME_NEW_CLASSES": LAST_5,
                "NAME_EXCLUDED_CLASSES": [],
            },
        },
        "DATASETS": {"TRAIN": ["voc_rb_synthetic_train"],
                     "TEST": ["voc_synthetic_test"]},
        "OUTPUT_DIR": "output/", "TENSORBOARD_DIR": "output/",
    })
    (cfg_dir / "e2e_faster_rcnn_R_50_C4_4x_RB_Target_model.yaml").write_text(
        yaml.safe_dump(target)
    )
    return wd


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


def test_full_pipeline(workdir):
    tool = lambda name: os.path.join(REPO, "tools", name)

    # 1. first-task training (+ eval)
    _run(workdir, tool("train_first_step.py"),
         "-c", "configs/voc/15-5/e2e_faster_rcnn_R_50_C4_4x.yaml")
    out = workdir / "output" / "15-5" / "LR005_BS4_FILOD"
    assert (out / "model_trimmed.msgpack").exists()
    assert (out / "model_final.msgpack").exists()

    # 2. prototype box selection (step 0)
    _run(workdir, tool("prototype_box_selection.py"),
         "-n", "ABR", "-t", "15-5", "-s", "0", "-mb", "8", "-mt", "mean", "-iss")
    mem_dir = out / "mean_8"
    crops = [f for f in os.listdir(mem_dir) if f.endswith(".jpg")]
    assert len(crops) >= 8, crops
    # crop names are {cls}_{idx:05d}.jpg with classes from the first task
    classes = {int(c.split("_")[0]) for c in crops}
    assert classes <= set(range(1, 16))

    # 3. ABR incremental step with full distillation
    _run(workdir, tool("train_incremental.py"),
         "-t", "15-5", "-n", "ABR", "-s", "1",
         "--feat", "ard", "-gamma", "1.0", "--uce", "--dist_type", "id",
         "-alpha", "0.5", "-beta", "1.0", "-mb", "8", "-mt", "mean",
         "--max-iter", "3")
    step_out = workdir / "output" / "15-5" / "ABR" / "STEP1"
    assert (step_out / "model_trimmed.msgpack").exists()

    # the per-step AP ledger was appended (reference output/{task}.txt)
    ledger = workdir / "output" / "15-5.txt"
    assert ledger.exists()
    line = ledger.read_text().strip().splitlines()[-1]
    parts = line.split(",")
    assert parts[0] == "ABR" and parts[1] == "1"
    assert len(parts) == 2 + 20  # name, step, 20 per-class APs


def test_multi_step_continuation(workdir):
    """STEP 2 on a 10-5-style multi-step config: class rotation, weight
    chaining through STEP1/model_trimmed, PBS memory update."""
    tool = lambda name: os.path.join(REPO, "tools", name)
    cfg_dir = workdir / "configs" / "voc" / "m5"
    cfg_dir.mkdir(parents=True, exist_ok=True)

    first10 = FIRST_15[:10]
    rest10 = FIRST_15[10:] + LAST_5
    target = _deep_merge(TINY_COMMON, {
        "MODEL": {
            "WEIGHT": "output/15-5/LR005_BS4_FILOD/model_trimmed.msgpack",
            "SOURCE_WEIGHT": "output/15-5/LR005_BS4_FILOD/model_final.msgpack",
            "ROI_BOX_HEAD": {
                "NUM_CLASSES": 21,
                "NAME_OLD_CLASSES": first10, "NAME_NEW_CLASSES": rest10,
                "NAME_EXCLUDED_CLASSES": [],
            },
        },
        "DATASETS": {"TRAIN": ["voc_rb_synthetic_train"],
                     "TEST": ["voc_synthetic_test"]},
        "OUTPUT_DIR": "output/", "TENSORBOARD_DIR": "output/",
        "CLS_PER_STEP": 5,
    })
    (cfg_dir / "e2e_faster_rcnn_R_50_C4_4x_RB_Target_model.yaml").write_text(
        yaml.safe_dump(target)
    )

    # reuse the 15-5 first-task memory from test_full_pipeline as step-0
    # memory for this task (same on-disk format)
    import shutil
    src_mem = workdir / "output" / "15-5" / "LR005_BS4_FILOD" / "mean_8"
    assert src_mem.exists()

    for s in (1, 2):
        _run(workdir, tool("train_incremental.py"),
             "-t", "m5", "-n", "MS", "-s", str(s),
             "--feat", "ard", "-gamma", "1.0", "--dist_type", "id",
             "-alpha", "0.5", "-beta", "1.0", "-mb", "8", "-mt", "mean",
             "--max-iter", "2", "--skip-test")
        # PBS for this step feeds the next one
        _run(workdir, tool("prototype_box_selection.py"),
             "-n", "MS", "-t", "m5", "-s", str(s), "-mb", "8", "-mt", "mean",
             "-iss")
        step_out = workdir / "output" / "m5" / "MS" / f"STEP{s}"
        assert (step_out / "model_trimmed.msgpack").exists(), s
    mem_dir = workdir / "output" / "m5" / "MS" / "mean_8"
    assert mem_dir.exists()
    crops = [f for f in os.listdir(mem_dir) if f.endswith(".jpg")]
    assert len(crops) >= 4
