#!/usr/bin/env python
"""Single-process multi-checkpoint evaluation driver.

Multi-step chains (scripts/run_MI.sh; tools/run_fullscale_chain.py)
re-evaluate the SAME test set after every incremental step — the
reference pays a full dataloader pass per eval (its tools launch one
process per stage, engine/inference.py streams every image).  This tool
evaluates MANY step checkpoints in ONE process sharing one device
canvas bank (data/device_cache.py): the test canvases cross the
host→device link once, and every later eval assembles its pixel batches
HBM→HBM.  Results are bit-identical to the per-process evals (bank hits
are the exact bytes the host would ship) and land in the same ledgers
run_test always writes (output/{task}.txt rows keyed NAME,STEP).

Usage (after a chain trained with --skip-test):
  python tools/eval_steps.py -t 10-1 --steps 10 --runs ABR:mean FT
  python tools/eval_steps.py -t 15-5 --steps 1 --runs ABR:mean \
      --first-config configs/voc/15-5/e2e_faster_rcnn_R_50_C4_4x.yaml

Each run spec is NAME[:MEMORY_TYPE]; MEMORY_TYPE picks the same target
yaml train_incremental used (RB_Target_model for mean/random/herding,
Target_model otherwise) so the eval cfg reproduces the training cfg's
class rotation exactly (build_configs is imported from the train CLI).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from abr_iod_tpu.utils.platform import (  # noqa: E402
    enable_persistent_compile_cache, maybe_init_distributed,
    respect_jax_platforms_env,
)

respect_jax_platforms_env()
enable_persistent_compile_cache()
maybe_init_distributed()


def _inc_namespace(task, name, step, mem_type, seed, tpu_opts):
    """The argparse surface build_configs (tools/train_incremental.py)
    consumes; distillation knobs don't touch the eval path."""
    return argparse.Namespace(
        task=task, name=name, step=step, seed=seed,
        memory_type=mem_type, memory_buffer=0, tpu_opts=tpu_opts,
        feat="no", att_gamma=0.0, dist_type="l2",
        alpha_inclusive_distillation=0.0,
        beta_attentive_roi_distillation=0.0, inc=False,
    )


def main():
    ap = argparse.ArgumentParser(description="multi-step eval driver")
    ap.add_argument("-t", "--task", default="15-5")
    ap.add_argument("--steps", type=int, required=True,
                    help="evaluate steps 1..N for every run spec")
    ap.add_argument("--runs", nargs="+", default=["ABR:mean"],
                    metavar="NAME[:MEMTYPE]")
    ap.add_argument("--first-config", default=None,
                    help="also evaluate the first-task checkpoint (STEP 0) "
                         "trained from this yaml, sharing the same bank")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--bank-mb", type=float, default=None,
                    help="device canvas bank budget (default: "
                         "TPU.DEVICE_CANVAS_CACHE_MB; 0 disables)")
    ap.add_argument("--tpu-opts", nargs="*", default=None)
    args = ap.parse_args()

    import jax

    from train_incremental import build_configs  # noqa: E402 — same dir

    from abr_iod_tpu.config import get_default_config
    from abr_iod_tpu.engine.driver import run_test
    from abr_iod_tpu.utils.logging import setup_logger

    runs = []
    for spec in args.runs:
        name, _, mt = spec.partition(":")
        runs.append((name, mt if mt and mt != "none" else None))

    # one bank for every eval in the process — keys include the canvas
    # shape and min_size, so evals of different-geometry cfgs coexist
    probe_ns = _inc_namespace(args.task, runs[0][0], 1, runs[0][1],
                              args.seed, args.tpu_opts)
    _, cfg0 = build_configs(probe_ns)
    budget = (args.bank_mb if args.bank_mb is not None
              else float(cfg0.TPU.get("DEVICE_CANVAS_CACHE_MB", 0)))
    bank = None
    if budget > 0 and jax.process_count() == 1:
        from abr_iod_tpu.data.device_cache import DeviceCanvasBank

        bank = DeviceCanvasBank(
            budget, tuple(cfg0.TPU.CANVAS_TEST),
            dual_orientation=bool(cfg0.TPU.get("DUAL_ORIENTATION", True)),
        )

    logger = setup_logger("abr_iod_tpu.eval_steps", cfg0.OUTPUT_DIR)
    logger.info(f"eval_steps: task={args.task} steps=1..{args.steps} "
                f"runs={args.runs} bank={budget:.0f}MB")

    walls = []
    if args.first_config:
        cfg = get_default_config()
        cfg.merge_from_file(args.first_config)
        if args.tpu_opts:
            cfg.merge_from_list(args.tpu_opts)
        cfg.SEED = args.seed
        # ledger identity (run_test keys output/{task}.txt rows on these —
        # the train CLI gets them as opts: run_fullscale_chain.py)
        cfg.TASK = args.task
        cfg.NAME = "FIRST"
        cfg.STEP = 0
        cfg.freeze()
        t0 = time.time()
        run_test(cfg, logger=logger, pixel_bank=bank)
        walls.append(("FIRST", 0, time.time() - t0))

    for name, mt in runs:
        for s in range(1, args.steps + 1):
            _, cfg_t = build_configs(
                _inc_namespace(args.task, name, s, mt, args.seed,
                               args.tpu_opts))
            t0 = time.time()
            run_test(cfg_t, logger=logger, pixel_bank=bank)
            walls.append((name, s, time.time() - t0))

    for name, s, dt in walls:
        logger.info(f"eval wall {name} STEP{s}: {dt:.1f}s")
    if bank is not None:
        logger.info(f"bank stats: {bank.stats()}")


if __name__ == "__main__":
    main()
