#!/usr/bin/env python
"""Incremental (ABR) training CLI — reference: tools/train_incremental.py.

Preserves the reference's exact argument surface (--feat {no,std,ard},
--dist_type {l2,id,none}, -alpha/-beta/-gamma, -t task, -n name,
-s step, -mb memory buffer, -mt {mean,random,herding}, --inc, --seed,
--skip-test, -cvd) plus ``--uce`` accepted as a no-op: the reference's
run_SI.sh/run_MI.sh pass it but its parser never defined it
(SURVEY.md §2.1) — tolerating it keeps the scripts runnable.

Per-step config surgery mirrors train_incremental.py:398-469: the
source (teacher) head has |old|+ (step-1)*CLS_PER_STEP classes, the
target grows by CLS_PER_STEP, class lists rotate, and weights chain
through output/{task}/{name}/STEP{s-1}/model_trimmed.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from abr_iod_tpu.utils.platform import (  # noqa: E402
    enable_persistent_compile_cache, maybe_init_distributed,
    respect_jax_platforms_env,
)

respect_jax_platforms_env()
enable_persistent_compile_cache()
maybe_init_distributed()


def build_configs(args):
    from abr_iod_tpu.config import get_default_config

    if args.memory_type is None:
        target_cfg_file = (
            f"configs/voc/{args.task}/e2e_faster_rcnn_R_50_C4_4x_Target_model.yaml"
        )
    else:
        target_cfg_file = (
            f"configs/voc/{args.task}/e2e_faster_rcnn_R_50_C4_4x_RB_Target_model.yaml"
        )
    full_name = f"{args.name}/STEP{args.step}"
    base = "output"

    cfg_source = get_default_config()
    cfg_source.merge_from_file(target_cfg_file)
    if args.tpu_opts:
        cfg_source.merge_from_list(args.tpu_opts)
    cfg_source.MODEL.WEIGHT = cfg_source.MODEL.SOURCE_WEIGHT
    if args.step >= 2:
        cfg_source.MODEL.WEIGHT = (
            f"{base}/{args.task}/{args.name}/STEP{args.step - 1}/model_trimmed.msgpack"
        )
    n_old = len(cfg_source.MODEL.ROI_BOX_HEAD.NAME_OLD_CLASSES)
    if args.step > 0 and cfg_source.CLS_PER_STEP != -1:
        cfg_source.MODEL.ROI_BOX_HEAD.NUM_CLASSES = (
            n_old + 1 + (args.step - 1) * cfg_source.CLS_PER_STEP
        )
    else:
        cfg_source.MODEL.ROI_BOX_HEAD.NUM_CLASSES = n_old + 1
    cfg_source.OUTPUT_DIR = os.path.join(
        cfg_source.OUTPUT_DIR, args.task, full_name, "SRC"
    )
    cfg_source.TENSORBOARD_DIR = os.path.join(
        cfg_source.TENSORBOARD_DIR, args.task, full_name
    )
    cfg_source.SEED = args.seed
    cfg_source.freeze()

    cfg_target = get_default_config()
    cfg_target.merge_from_file(target_cfg_file)
    if args.tpu_opts:
        cfg_target.merge_from_list(args.tpu_opts)
    if args.step >= 2 and cfg_source.CLS_PER_STEP != -1:
        cfg_target.MODEL.WEIGHT = (
            f"{base}/{args.task}/{args.name}/STEP{args.step - 1}/model_trimmed.msgpack"
        )
    if args.step > 0 and cfg_target.CLS_PER_STEP != -1:
        cps = cfg_target.CLS_PER_STEP
        head = cfg_target.MODEL.ROI_BOX_HEAD
        head.NUM_CLASSES = len(head.NAME_OLD_CLASSES) + 1 + args.step * cps
        new_all = tuple(head.NAME_NEW_CLASSES)
        head.NAME_OLD_CLASSES = tuple(head.NAME_OLD_CLASSES) + new_all[: (args.step - 1) * cps]
        head.NAME_EXCLUDED_CLASSES = new_all[args.step * cps:]
        head.NAME_NEW_CLASSES = new_all[(args.step - 1) * cps: args.step * cps]

    cfg_target.DIST.FEAT = args.feat
    cfg_target.DIST.GAMMA = args.att_gamma
    cfg_target.DIST.BETA = args.beta_attentive_roi_distillation
    cfg_target.DIST.TYPE = args.dist_type
    cfg_target.DIST.ALPHA = args.alpha_inclusive_distillation
    cfg_target.OUTPUT_DIR = os.path.join(cfg_target.OUTPUT_DIR, args.task, full_name)
    cfg_target.INCREMENTAL = args.inc
    cfg_target.TENSORBOARD_DIR = os.path.join(
        cfg_target.TENSORBOARD_DIR, args.task, full_name
    )
    cfg_target.TASK = args.task
    cfg_target.STEP = args.step
    cfg_target.NAME = args.name
    cfg_target.MEM_BUFF = args.memory_buffer or None
    cfg_target.MEM_TYPE = args.memory_type
    cfg_target.SEED = args.seed
    cfg_target.freeze()
    return cfg_source, cfg_target


def main():
    parser = argparse.ArgumentParser(description="TPU Incremental Detection Training")
    parser.add_argument("--local_rank", type=int, default=0)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--skip-test", dest="skip_test", action="store_true")
    # "afd" is accepted as an alias of "ard": the reference's run_MI.sh
    # passes --feat afd which its own parser rejects (SURVEY.md §2.1)
    parser.add_argument("--feat", default="no", type=str,
                        choices=["no", "std", "ard", "afd"])
    parser.add_argument("-gamma", "--att_gamma", default=0.0, type=float)
    parser.add_argument("--inc", default=False, action="store_true")
    parser.add_argument("--uce", default=False, action="store_true",
                        help="accepted for script compatibility (no-op; UCE is "
                             "keyed off --dist_type id, as in the reference)")
    parser.add_argument("-alpha", "--alpha_inclusive_distillation", default=0.0, type=float)
    parser.add_argument("-beta", "--beta_attentive_roi_distillation", default=0.0, type=float)
    parser.add_argument("--dist_type", default="l2", type=str, choices=["l2", "id", "none"])
    parser.add_argument("-t", "--task", type=str, default="15-5")
    parser.add_argument("-n", "--name", default="EXP")
    parser.add_argument("-s", "--step", default=1, type=int)
    parser.add_argument("-mb", "--memory_buffer", default=0, type=int)
    parser.add_argument("-mt", "--memory_type", default=None, type=str,
                        choices=["mean", "random", "herding"])
    parser.add_argument("-cvd", "--cuda_visible_devices", default="", type=str)
    parser.add_argument("--max-iter", type=int, default=None)
    parser.add_argument("--tpu-opts", nargs="*", default=None,
                        help="extra cfg overrides, e.g. TPU.CANVAS_TRAIN '(512,512)'")
    args = parser.parse_args()
    if args.feat == "afd":
        args.feat = "ard"

    cfg_source, cfg_target = build_configs(args)

    from abr_iod_tpu.engine.driver import run_incremental_training, run_test
    from abr_iod_tpu.utils.logging import setup_logger

    os.makedirs(cfg_target.OUTPUT_DIR, exist_ok=True)
    logger = setup_logger("abr_iod_tpu.incremental", cfg_target.OUTPUT_DIR)
    logger.info(
        f"task={args.task} step={args.step} feat={args.feat} dist={args.dist_type} "
        f"alpha={args.alpha_inclusive_distillation} beta={args.beta_attentive_roi_distillation} "
        f"mb={args.memory_buffer} mt={args.memory_type}"
    )

    params = run_incremental_training(
        cfg_source, cfg_target, logger, max_iter_override=args.max_iter
    )
    if not args.skip_test and args.step != 0:
        run_test(cfg_target, params=params, logger=logger)


if __name__ == "__main__":
    main()
