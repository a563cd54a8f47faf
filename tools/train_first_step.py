#!/usr/bin/env python
"""First-task / joint training CLI (reference: tools/train_first_step.py).

Same workflow: merge task YAML, set IS_FATHER, train, save
model_final/model_trimmed, then evaluate — but the loop is one compiled
jit step on the TPU mesh instead of DDP processes; no
torch.distributed.launch wrapper is needed (SPMD covers all chips from
one process).
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
    parser = argparse.ArgumentParser(description="TPU Object Detection Training")
    # both spellings: the reference parser uses --config_file
    # (tools/train_first_step.py:163-168)
    parser.add_argument(
        "-c", "--config-file", "--config_file", dest="config_file",
        required=True, metavar="FILE",
    )
    parser.add_argument("--local_rank", type=int, default=0)  # accepted, unused
    # run_JT.sh / run_firststep.sh pass -cvd to this tool; device selection
    # is meaningless under SPMD (one process drives the whole mesh) but the
    # shipped scripts must run unmodified
    parser.add_argument("-cvd", "--cuda_visible_devices", default="", type=str)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--skip-test", dest="skip_test", action="store_true")
    parser.add_argument("-fb", "--freeze_backbone", action="store_true")
    parser.add_argument("-fr", "--freeze_rpn", action="store_true")
    parser.add_argument("--max-iter", type=int, default=None,
                        help="override SOLVER.MAX_ITER (smoke runs)")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args()

    from abr_iod_tpu.config import get_default_config
    from abr_iod_tpu.engine.driver import run_first_task_training, run_test
    from abr_iod_tpu.utils.logging import setup_logger

    cfg = get_default_config()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.SEED = args.seed
    cfg.IS_FATHER = True
    if args.freeze_backbone:
        cfg.MODEL.BACKBONE.FREEZE = True
    if args.freeze_rpn:
        cfg.MODEL.RPN.FREEZE = True
    cfg.freeze()

    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    logger = setup_logger("abr_iod_tpu.first", cfg.OUTPUT_DIR)
    logger.info(f"config: {args.config_file}")

    params = run_first_task_training(cfg, logger, max_iter_override=args.max_iter)

    if not args.skip_test:
        run_test(cfg, params=params, logger=logger)


if __name__ == "__main__":
    main()
