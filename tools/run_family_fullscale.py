#!/usr/bin/env python
"""Full-scale CLI workflow proof for the non-flagship detector families.

The reference's tools are family-agnostic — the same train_first_step
surface trains Mask R-CNN / Keypoint R-CNN / FPN variants purely via
config (reference tools/train_first_step.py:159-235,
modeling/roi_heads/mask_head/mask_head.py:81-86).  This driver exercises
that property at full scale on the real chip: for each requested family
it writes a full-R-50 config (832x1344 canvas via the default
TPU.CANVAS_TRAIN, batch 8, 600 iters), generates the matching synthetic
set (VOC-xml for fpn, COCO-json for mask/keypoint), runs the REAL
``tools/train_first_step.py`` including its protocol eval (VOC mAP /
voc_eval_inst 9-threshold / keypoint decode), and appends one ledger
line per family.

  python tools/run_fullscale_chain.py ... # the incremental chains
  python tools/run_family_fullscale.py --families fpn,mask,keypoint

Stamp files (.done_<family>) make re-runs resumable like the chain
driver.
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VOC20 = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]


def _common(args) -> dict:
    return {
        "SOLVER": {
            "MAX_ITER": args.iters,
            "STEPS": [int(args.iters * 0.75)],
            "WARMUP_ITERS": min(100, args.iters // 6),
            "IMS_PER_BATCH": args.batch,
            "CHECKPOINT_PERIOD": max(args.iters, 1),
            "BASE_LR": args.lr,
        },
        "TEST": {"IMS_PER_BATCH": args.batch},
    }


def family_cfg(family: str, args) -> dict:
    cfg = _common(args)
    if family == "fpn":
        cfg["MODEL"] = {
            "BACKBONE": {"CONV_BODY": "R-50-FPN"},
            "RESNETS": {"BACKBONE_OUT_CHANNELS": 256},
            "RPN": {
                "ANCHOR_SIZES": [32, 64, 128, 256, 512],
                "ASPECT_RATIOS": [0.5, 1.0, 2.0],
            },
            "ROI_BOX_HEAD": {
                "MLP_HEAD_DIM": 1024,
                "NUM_CLASSES": 21,
                "NAME_OLD_CLASSES": [],
                "NAME_NEW_CLASSES": VOC20,
                "NAME_EXCLUDED_CLASSES": [],
            },
        }
        cfg["DATASETS"] = {"TRAIN": ["voc_rb_synthetic_train"],
                           "TEST": ["voc_synthetic_test"]}
    elif family == "mask":
        cfg["MODEL"] = {
            "MASK_ON": True,
            "ROI_BOX_HEAD": {
                "NUM_CLASSES": 21,
                "NAME_OLD_CLASSES": [],
                "NAME_NEW_CLASSES": VOC20,
                "NAME_EXCLUDED_CLASSES": [],
            },
        }
        cfg["DATASETS"] = {"TRAIN": ["instseg_synthetic_train"],
                           "TEST": ["instseg_synthetic_test"]}
    elif family == "keypoint":
        cfg["MODEL"] = {
            "KEYPOINT_ON": True,
            "ROI_BOX_HEAD": {
                "NUM_CLASSES": 2,
                "NAME_OLD_CLASSES": [],
                "NAME_NEW_CLASSES": ["person"],
                "NAME_EXCLUDED_CLASSES": [],
            },
        }
        cfg["DATASETS"] = {"TRAIN": ["keypoints_synthetic_train"],
                           "TEST": ["keypoints_synthetic_test"]}
    else:
        raise SystemExit(f"unknown family {family}")
    cfg["OUTPUT_DIR"] = f"output/family_{family}"
    cfg["TENSORBOARD_DIR"] = f"output/family_{family}/tb"
    return cfg


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--families", default="fpn,mask,keypoint")
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.002)
    ap.add_argument("--synth-images", type=int, default=150)
    ap.add_argument("--workdir", default="/tmp/family_fullscale")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    wd = args.workdir
    os.makedirs(os.path.join(wd, "configs"), exist_ok=True)
    env = dict(os.environ)
    env["ABR_IOD_DATA_DIR"] = os.path.join(wd, "datasets")
    env["ABR_IOD_SYNTH_IMAGES"] = str(args.synth_images)
    env["ABR_IOD_SYNTH_H"] = env.get("ABR_IOD_SYNTH_H", "600")
    env["ABR_IOD_SYNTH_W"] = env.get("ABR_IOD_SYNTH_W", "1000")
    env["ABR_IOD_ALLOW_RANDOM_INIT"] = "1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

    ledger = os.path.join(wd, "family_ledger.jsonl")
    for family in args.families.split(","):
        family = family.strip()
        stamp = os.path.join(wd, f".done_{family}")
        if args.resume and os.path.exists(stamp):
            print(f"[family] {family}: stamped done, skipping", flush=True)
            continue
        cpath = os.path.join(wd, "configs", f"{family}.yaml")
        yaml.safe_dump(family_cfg(family, args), open(cpath, "w"))
        log = os.path.join(wd, f"log_{family}.log")
        cmd = [sys.executable, os.path.join(REPO, "tools/train_first_step.py"),
               "-c", cpath]
        print(f"[family] {family}: {' '.join(cmd)}", flush=True)
        t0 = time.time()
        with open(log, "w") as f:
            p = subprocess.run(cmd, cwd=wd, env=env,
                               stdout=f, stderr=subprocess.STDOUT)
        dt = time.time() - t0
        text = open(log).read()
        if p.returncode != 0:
            print(f"[family] {family} FAILED (exit {p.returncode}); tail:")
            print("\n".join(text.splitlines()[-25:]))
            sys.exit(p.returncode)
        # pull the last loss line + the protocol eval summary
        losses = re.findall(r"iter (\d+)/\d+\s+.*?loss: ([0-9.]+)", text)
        maps = re.findall(r"mAP[=:]\s*([0-9.]+)", text)
        inst = re.findall(r"instance-seg mAP.*", text)
        row = {
            "family": family, "iters": args.iters, "batch": args.batch,
            "wall_s": round(dt, 1),
            "first_loss": float(losses[0][1]) if losses else None,
            "final_loss": float(losses[-1][1]) if losses else None,
            "eval_map": float(maps[-1]) if maps else None,
            "inst_eval": inst[-1] if inst else None,
        }
        with open(ledger, "a") as f:
            f.write(json.dumps(row) + "\n")
        with open(stamp, "w") as f:
            f.write(f"{dt:.0f}\n")
        print(f"[family] {family} done in {dt:.0f}s: {json.dumps(row)}",
              flush=True)
    print(f"[family] ledger: {ledger}", flush=True)
    if os.path.exists(ledger):
        print(open(ledger).read())


if __name__ == "__main__":
    main()
