#!/usr/bin/env python
"""Prototype Box Selection CLI — reference: tools/prototype_box_selection.py.

Runs the frozen model over the current-task train set in sampling mode,
extracts per-GT-box RoI features + logits, and delegates selection /
crop saving to Mem (random/mean/herding).  Memory layout on disk is the
reference's: ``{out_dir}/{mem_type}_{mem_size}/{cls}_{idx:05d}.jpg``.
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


def main():
    parser = argparse.ArgumentParser(description="TPU Prototype Box Selection")
    parser.add_argument("--local_rank", type=int, default=0)
    parser.add_argument("-t", "--task", type=str, default="15-5")
    parser.add_argument("-n", "--name", default="EXP")
    parser.add_argument("-s", "--step", default=0, type=int)
    parser.add_argument("-mb", "--memory_buffer", default=2000, type=int)
    parser.add_argument("-mt", "--memory_type", default="mean", type=str,
                        choices=["mean", "random", "herding"])
    parser.add_argument("-cvd", "--cuda_visible_devices", default="", type=str)
    parser.add_argument("-iss", "--is_sample", action="store_true",
                        help="sampling phase flag (script compatibility)")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--tpu-opts", nargs="*", default=None)
    # parsed-but-unread flags of the reference parser (its main() never
    # touches them — prototype_box_selection.py:316-392); tolerated so
    # invocations written against the reference run unmodified
    parser.add_argument("--skip-test", dest="skip_test", action="store_true")
    parser.add_argument("--rpn", action="store_true")
    parser.add_argument("--feat", default="no", type=str)
    parser.add_argument("--uce", action="store_true")
    parser.add_argument("--init", action="store_true")
    parser.add_argument("--inv", action="store_true")
    parser.add_argument("--mask", default=1.0, type=float)
    parser.add_argument("--cls", default=1.0, type=float)
    args = parser.parse_args()

    from abr_iod_tpu.config import get_default_config
    from abr_iod_tpu.data.loader import DetectionLoader
    from abr_iod_tpu.engine.driver import load_params, make_data_source
    from abr_iod_tpu.memory.pbs import extract_bboxes_and_features
    from abr_iod_tpu.memory.rehearsal import Mem
    from abr_iod_tpu.models.build import build_detection_model
    from abr_iod_tpu.utils.logging import setup_logger

    # config surgery mirrors prototype_box_selection.py:213-355: sampling
    # phase over the model that was just trained at `step`
    if args.step == 0:
        cfg_file = f"configs/voc/{args.task}/e2e_faster_rcnn_R_50_C4_4x.yaml"
    else:
        cfg_file = f"configs/voc/{args.task}/e2e_faster_rcnn_R_50_C4_4x_RB_Target_model.yaml"
    cfg = get_default_config()
    cfg.merge_from_file(cfg_file)
    if args.tpu_opts:
        cfg.merge_from_list(args.tpu_opts)
    cfg.IS_SAMPLE = True
    cfg.MEM_BUFF = args.memory_buffer
    cfg.MEM_TYPE = args.memory_type
    cfg.TASK = args.task
    cfg.NAME = args.name
    cfg.STEP = args.step
    cfg.SEED = args.seed

    if args.step == 0:
        out_dir = cfg.OUTPUT_DIR
        weight = os.path.join(out_dir, "model_trimmed.msgpack")
    else:
        cps = cfg.CLS_PER_STEP
        head = cfg.MODEL.ROI_BOX_HEAD
        if args.step > 0 and cps != -1:
            new_all = tuple(head.NAME_NEW_CLASSES)
            head.NUM_CLASSES = len(head.NAME_OLD_CLASSES) + 1 + args.step * cps
            head.NAME_OLD_CLASSES = tuple(head.NAME_OLD_CLASSES) + new_all[: (args.step - 1) * cps]
            head.NAME_EXCLUDED_CLASSES = new_all[args.step * cps:]
            head.NAME_NEW_CLASSES = new_all[(args.step - 1) * cps: args.step * cps]
        out_dir = f"output/{args.task}/{args.name}"
        weight = os.path.join(out_dir, f"STEP{args.step}", "model_trimmed.msgpack")

    mem_dir = os.path.join(out_dir, f"{args.memory_type}_{args.memory_buffer}")
    cfg.freeze()

    logger = setup_logger("abr_iod_tpu.pbs", out_dir)

    # skip when the step-0 memory is already populated
    # (prototype_box_selection.py:180-183)
    if args.step == 0 and os.path.isdir(mem_dir) and len(os.listdir(mem_dir)) >= args.memory_buffer:
        logger.info(f"memory at {mem_dir} already populated — skipping")
        return

    model = build_detection_model(cfg)
    params = load_params(cfg, model, logger, weight_path=weight)

    source = make_data_source(cfg, cfg.DATASETS.TRAIN[0], "sample_new")
    loader = DetectionLoader(
        source, cfg, batch_size=int(cfg.TEST.IMS_PER_BATCH), is_train=False,
        canvas=tuple(cfg.TPU.CANVAS_TEST), flip=False, normalize="device",
    )
    logger.info(f"extracting box features over {len(source)} images")
    info = extract_bboxes_and_features(model, params, loader, cfg)
    total = sum(len(c) for c in info)
    logger.info(f"collected {total} candidate boxes over {len(info)} classes")

    os.makedirs(mem_dir, exist_ok=True)
    mem = Mem(cfg, step=args.step, current_mem_path=mem_dir, img_root=source.root)
    mem.update_memory(info)
    logger.info(f"box rehearsal memory written to {mem_dir} "
                f"({len(os.listdir(mem_dir))} crops)")


if __name__ == "__main__":
    main()
