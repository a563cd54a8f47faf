#!/usr/bin/env python
"""Generate the configs/voc experiment tree.

Reads the training *recipes* (class splits, LR schedules, batch sizes —
experiment data, not code) from the reference configs when available and
emits this framework's YAML files with the same names
(configs/voc/{task}/e2e_faster_rcnn_R_50_C4_4x[_Target_model|_RB_Target_model].yaml
+ the JT config), so the reference's scripts/workflow maps 1:1.
"""

from __future__ import annotations

import os
import sys

import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from abr_iod_tpu.config.catalog import VOC_CLASSES  # noqa: E402

REF = os.environ.get("ABR_IOD_REFERENCE_CONFIGS", "/root/reference/configs/voc")
OUT = os.environ.get(
    "ABR_IOD_CONFIG_OUT",
    os.path.join(os.path.dirname(__file__), "..", "configs", "voc"),
)

TASKS = {
    # task: (n_first, cls_per_step or None)
    "19-1": (19, None),
    "15-5": (15, None),
    "10-10": (10, None),
    "5-15": (5, None),
    "10-5": (10, 5),
    "10-2": (10, 2),
    "15-1": (15, 1),
    "10-1": (10, 1),
    "5-5": (5, 5),
}

# fallback recipes when the reference tree is absent: (lr, steps, max_iter, ckpt)
FALLBACK = {
    "first": (0.005, (7500,), 10000, 2500),
    "incremental": (0.002, (12500,), 15000, 3000),
    "jt": (0.005, (7500,), 20000, 2500),
}

# ImageNet backbone for base-task / JT training (reference
# configs/voc/*/e2e_faster_rcnn_R_50_C4_4x.yaml:3); load_params resolves
# catalog:// to a local R-50.pkl/resnet50.pth under ABR_IOD_WEIGHTS_DIR.
PRETRAINED = "catalog://ImageNetPretrained/MSRA/R-50"

# Which split's FIRST-TASK artifacts each incremental run starts from.
# Multi-step splits chain off the matching single-step base (reference
# configs/voc/10-1/e2e_faster_rcnn_R_50_C4_4x_RB_Target_model.yaml:3-4
# points at output/10-10/...; likewise 10-2,10-5→10-10, 15-1→15-5, 5-5→5-15).
WEIGHT_BASE = {
    "10-1": "10-10",
    "10-2": "10-10",
    "10-5": "10-10",
    "15-1": "15-5",
    "5-5": "5-15",
}


def ref_weights(path):
    """Read MODEL.WEIGHT/SOURCE_WEIGHT from a reference YAML (translated
    .pth→.msgpack) so the generated tree chains splits exactly as the
    reference does, quirks included."""
    if not os.path.exists(path):
        return None
    with open(path) as f:
        m = yaml.safe_load(f).get("MODEL", {})
    w, sw = m.get("WEIGHT"), m.get("SOURCE_WEIGHT")
    if not w or not sw:
        return None
    fix = lambda p: p[: -len(".pth")] + ".msgpack" if p.endswith(".pth") else p
    return fix(w), fix(sw)


def ref_solver(path, kind):
    if os.path.exists(path):
        with open(path) as f:
            data = yaml.safe_load(f)
        s = data.get("SOLVER", {})
        steps = s.get("STEPS", FALLBACK[kind][1])
        if isinstance(steps, str):
            import ast

            steps = ast.literal_eval(steps)
        return {
            "BASE_LR": float(s.get("BASE_LR", FALLBACK[kind][0])),
            "STEPS": list(steps),
            "MAX_ITER": int(s.get("MAX_ITER", FALLBACK[kind][2])),
            "CHECKPOINT_PERIOD": int(s.get("CHECKPOINT_PERIOD", FALLBACK[kind][3])),
            "IMS_PER_BATCH": int(s.get("IMS_PER_BATCH", 4)),
            "WEIGHT_DECAY": float(s.get("WEIGHT_DECAY", 1e-4)),
            "GAMMA": 0.1,
            "MOMENTUM": 0.9,
        }
    lr, steps, it, ck = FALLBACK[kind]
    return {
        "BASE_LR": lr, "STEPS": list(steps), "MAX_ITER": it,
        "CHECKPOINT_PERIOD": ck, "IMS_PER_BATCH": 4,
        "WEIGHT_DECAY": 1e-4, "GAMMA": 0.1, "MOMENTUM": 0.9,
    }


def base_model(num_classes, old, new, excluded):
    return {
        "META_ARCHITECTURE": "GeneralizedRCNN",
        "BACKBONE": {"CONV_BODY": "R-50-C4"},
        "RESNETS": {"BACKBONE_OUT_CHANNELS": 1024},
        "RPN": {
            "USE_FPN": False,
            "ANCHOR_STRIDE": [16],
            "PRE_NMS_TOP_N_TRAIN": 12000,
            "PRE_NMS_TOP_N_TEST": 6000,
            "POST_NMS_TOP_N_TRAIN": 2000,
            "POST_NMS_TOP_N_TEST": 1000,
        },
        "ROI_HEADS": {"USE_FPN": False},
        "ROI_BOX_HEAD": {
            "POOLER_RESOLUTION": 7,
            "POOLER_SCALES": [0.0625],
            "POOLER_SAMPLING_RATIO": 2,
            "FEATURE_EXTRACTOR": "ResNet50Conv5ROIFeatureExtractor",
            "PREDICTOR": "FastRCNNPredictor",
            "NUM_CLASSES": num_classes,
            "NAME_OLD_CLASSES": list(old),
            "NAME_NEW_CLASSES": list(new),
            "NAME_EXCLUDED_CLASSES": list(excluded),
        },
    }


def dump(path, cfg):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)


def main():
    for task, (n_first, cls_per_step) in TASKS.items():
        first = VOC_CLASSES[:n_first]
        rest = VOC_CLASSES[n_first:]
        tdir = os.path.join(OUT, task)
        rdir = os.path.join(REF, task)

        # first-task config
        cfg = {
            "MODEL": dict(base_model(n_first + 1, [], first, rest), WEIGHT=PRETRAINED),
            "DATASETS": {"TRAIN": ["voc_rb_2007_trainval"], "TEST": ["voc_2007_test"]},
            "SOLVER": ref_solver(
                os.path.join(rdir, "e2e_faster_rcnn_R_50_C4_4x.yaml"), "first"
            ),
            "TEST": {"IMS_PER_BATCH": 4},
            "OUTPUT_DIR": f"output/{task}/LR005_BS4_FILOD",
        }
        dump(os.path.join(tdir, "e2e_faster_rcnn_R_50_C4_4x.yaml"), cfg)

        # incremental target configs (finetune + ABR variants)
        for suffix, train_set in (
            ("_Target_model", "voc_2007_trainval"),
            ("_RB_Target_model", "voc_rb_2007_trainval"),
        ):
            base_task = WEIGHT_BASE.get(task, task)
            weights = ref_weights(
                os.path.join(rdir, f"e2e_faster_rcnn_R_50_C4_4x{suffix}.yaml")
            ) or (
                f"output/{base_task}/LR005_BS4_FILOD/model_trimmed.msgpack",
                f"output/{base_task}/LR005_BS4_FILOD/model_final.msgpack",
            )
            cfg = {
                "MODEL": dict(
                    base_model(21, first, rest, []),
                    WEIGHT=weights[0],
                    SOURCE_WEIGHT=weights[1],
                ),
                "DATASETS": {"TRAIN": [train_set], "TEST": ["voc_2007_test"]},
                "SOLVER": ref_solver(
                    os.path.join(rdir, f"e2e_faster_rcnn_R_50_C4_4x{suffix}.yaml"),
                    "incremental",
                ),
                "TEST": {"IMS_PER_BATCH": 8},
                "OUTPUT_DIR": "output/",
                "TENSORBOARD_DIR": "output/",
            }
            if cls_per_step:
                cfg["CLS_PER_STEP"] = cls_per_step
            dump(os.path.join(tdir, f"e2e_faster_rcnn_R_50_C4_4x{suffix}.yaml"), cfg)

    # joint training config
    jt = {
        "MODEL": dict(base_model(21, [], VOC_CLASSES, []), WEIGHT=PRETRAINED),
        "DATASETS": {"TRAIN": ["voc_rb_2007_trainval"], "TEST": ["voc_2007_test"]},
        "SOLVER": ref_solver(
            os.path.join(REF, "e2e_faster_rcnn_R_50_C4_4x_JT.yaml"), "jt"
        ),
        "TEST": {"IMS_PER_BATCH": 4},
        "OUTPUT_DIR": "output/JT/LR005_BS4",
    }
    dump(os.path.join(OUT, "e2e_faster_rcnn_R_50_C4_4x_JT.yaml"), jt)
    print(f"configs written under {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
