#!/usr/bin/env python
"""Full-scale multi-step ABR-vs-finetune chain on synthetic VOC.

The strongest correctness artifact this (VOC-less, zero-egress)
environment can produce: run the COMPLETE multi-step incremental
workflow at reference scale — full R-50-C4, reference 832x1344 canvas,
reference recipes — through the ACTUAL CLI tools, exactly like the
reference's scripts/run_JT.sh + run_firststep.sh + run_MI.sh chain
(reference scripts/run_MI.sh:45-70):

  1. JT training (all 20 classes)            -> the "pretrained" seed
  2. first task  (e.g. 10 classes, 10-5)     -> seeded from JT
  3. PBS step 0  (box-rehearsal memory)
  4. per step s: ABR incremental train + eval -> PBS step s
     (step>1 exercises memory pruning, reference
      tools/extract_memory.py:238-267, and chained head growth +
      class rotation, reference tools/train_incremental.py:430-454)
  5. the same steps as a naive-finetune control (no memory, no distill)

Artifacts land in --workdir: per-stage logs, output/{task}.txt ledger
(NAME,STEP,per-class APs — the reference's format), checkpoints.

Example (the round-4 BASELINE.md run):
  python tools/run_fullscale_chain.py -t 10-5 --steps 2 \
      --jt-iters 1200 --first-iters 600 --inc-iters 600 -mb 200
"""

import argparse
import os
import subprocess
import sys
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _patch_common(cfg: dict, args, iters: int, lr=None) -> dict:
    cfg["DATASETS"] = {"TRAIN": ["voc_rb_synthetic_train"],
                       "TEST": ["voc_synthetic_test"]}
    s = cfg.setdefault("SOLVER", {})
    s["MAX_ITER"] = iters
    s["STEPS"] = [int(iters * 0.75)]
    s["WARMUP_ITERS"] = min(100, iters // 6)
    s["IMS_PER_BATCH"] = args.batch
    s["CHECKPOINT_PERIOD"] = max(iters, 1)
    if lr is not None:
        s["BASE_LR"] = lr
    cfg["TEST"] = {"IMS_PER_BATCH": args.batch}
    return cfg


def write_configs(args, wd: str) -> None:
    cdir = os.path.join(wd, "configs", "voc", args.task)
    os.makedirs(cdir, exist_ok=True)

    # JT (all 20 classes) — the pretrained-substitute seed
    jt = yaml.safe_load(
        open(os.path.join(REPO, "configs/voc/e2e_faster_rcnn_R_50_C4_4x_JT.yaml")))
    jt["MODEL"].pop("WEIGHT", None)  # random init: no ImageNet weights here
    _patch_common(jt, args, args.jt_iters)
    jt_out = jt.get("OUTPUT_DIR", "output/JT")
    yaml.safe_dump(jt, open(os.path.join(
        wd, "configs", "voc", "e2e_faster_rcnn_R_50_C4_4x_JT.yaml"), "w"))

    # first task — seeded from the JT trimmed checkpoint (leading-slice
    # head alignment shrinks 21->|old|+1; backbone/RPN transfer whole)
    first = yaml.safe_load(
        open(os.path.join(REPO, f"configs/voc/{args.task}/e2e_faster_rcnn_R_50_C4_4x.yaml")))
    first["MODEL"]["WEIGHT"] = os.path.join(jt_out, "model_trimmed.msgpack")
    _patch_common(first, args, args.first_iters)
    yaml.safe_dump(first, open(os.path.join(
        cdir, "e2e_faster_rcnn_R_50_C4_4x.yaml"), "w"))

    # ABR + plain finetune targets. The repo configs mirror the reference,
    # where e.g. 10-5's step-1 source lives under output/10-10/ (10-5 and
    # 10-10 share the same 10-class first task, reference
    # configs/voc/10-5/*_Target_model.yaml:3-4). This chain trains its own
    # first task under TASK={args.task}, so repoint WEIGHT/SOURCE_WEIGHT at
    # the output dir the `first` stage actually writes.
    first_out = first.get("OUTPUT_DIR", f"output/{args.task}/LR005_BS4_FILOD")
    for name in ("e2e_faster_rcnn_R_50_C4_4x_RB_Target_model.yaml",
                 "e2e_faster_rcnn_R_50_C4_4x_Target_model.yaml"):
        tgt = yaml.safe_load(
            open(os.path.join(REPO, f"configs/voc/{args.task}/{name}")))
        tgt["MODEL"]["WEIGHT"] = os.path.join(
            first_out, "model_trimmed.msgpack")
        tgt["MODEL"]["SOURCE_WEIGHT"] = os.path.join(
            first_out, "model_final.msgpack")
        _patch_common(tgt, args, args.inc_iters)
        yaml.safe_dump(tgt, open(os.path.join(cdir, name), "w"))


def run_stage(tag: str, cmd, wd: str, env, resume: bool = False) -> float:
    log = os.path.join(wd, f"log_{tag}.log")
    stamp = os.path.join(wd, f".done_{tag}")
    if resume and os.path.exists(stamp):
        print(f"[chain] {tag}: already done (stamp {stamp}), skipping",
              flush=True)
        return 0.0
    print(f"[chain] {tag}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    with open(log, "w") as f:
        p = subprocess.run(cmd, cwd=wd, env=env,
                           stdout=f, stderr=subprocess.STDOUT)
    dt = time.time() - t0
    if p.returncode != 0:
        print(f"[chain] {tag} FAILED (exit {p.returncode}); log tail:")
        print("\n".join(open(log).read().splitlines()[-25:]))
        sys.exit(p.returncode)
    with open(stamp, "w") as f:
        f.write(f"{dt:.0f}\n")
    print(f"[chain] {tag} done in {dt:.0f}s", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-t", "--task", default="10-5")
    ap.add_argument("--steps", type=int, default=2,
                    help="number of incremental steps to run")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--jt-iters", type=int, default=1200)
    ap.add_argument("--first-iters", type=int, default=600)
    ap.add_argument("--inc-iters", type=int, default=600)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("-mb", "--memory-buffer", type=int, default=200)
    ap.add_argument("-mt", "--memory-type", default="mean")
    ap.add_argument("--synth-images", type=int, default=150)
    ap.add_argument("--skip-jt", action="store_true",
                    help="reuse an existing JT checkpoint in the workdir")
    ap.add_argument("--resume", action="store_true",
                    help="skip stages whose .done_<tag> stamp exists in the workdir")
    ap.add_argument("--skip-ft", action="store_true",
                    help="skip the naive-finetune control chain")
    ap.add_argument("--defer-eval", action="store_true",
                    help="train all stages with --skip-test, then run every "
                         "eval in ONE process via tools/eval_steps.py — the "
                         "test canvases upload once and later evals assemble "
                         "batches from the device canvas bank")
    args = ap.parse_args()

    wd = args.workdir or f"/tmp/chain_{args.task}"
    os.makedirs(wd, exist_ok=True)
    write_configs(args, wd)

    env = dict(os.environ)
    env["ABR_IOD_DATA_DIR"] = os.path.join(wd, "datasets")
    env["ABR_IOD_SYNTH_IMAGES"] = str(args.synth_images)
    env["ABR_IOD_ALLOW_RANDOM_INIT"] = "1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

    py = sys.executable
    tools = os.path.join(REPO, "tools")
    mb, mt = str(args.memory_buffer), args.memory_type

    st = ["--skip-test"] if args.defer_eval else []
    t_all = time.time()
    if not args.skip_jt:
        run_stage("jt", [py, f"{tools}/train_first_step.py",
                         "-c", "configs/voc/e2e_faster_rcnn_R_50_C4_4x_JT.yaml",
                         *st, "TASK", args.task, "NAME", "JT", "STEP", "0"],
                  wd, env, resume=args.resume)
    run_stage("first", [py, f"{tools}/train_first_step.py",
                        "-c", f"configs/voc/{args.task}/e2e_faster_rcnn_R_50_C4_4x.yaml",
                        *st, "TASK", args.task, "NAME", "FIRST", "STEP", "0"],
              wd, env, resume=args.resume)
    run_stage("pbs0", [py, f"{tools}/prototype_box_selection.py",
                       "-n", "ABR", "-t", args.task, "-s", "0",
                       "-mb", mb, "-mt", mt, "-iss"], wd, env, resume=args.resume)
    for s in range(1, args.steps + 1):
        run_stage(f"abr{s}", [py, f"{tools}/train_incremental.py",
                              "-t", args.task, "-n", "ABR", "-s", str(s),
                              "--feat", "ard", "-gamma", "1.0", "--uce",
                              "--dist_type", "id", "-alpha", "0.5",
                              "-beta", "1.0", "-mb", mb, "-mt", mt, *st],
                  wd, env, resume=args.resume)
        if s < args.steps:
            run_stage(f"pbs{s}", [py, f"{tools}/prototype_box_selection.py",
                                  "-n", "ABR", "-t", args.task, "-s", str(s),
                                  "-mb", mb, "-mt", mt, "-iss"], wd, env, resume=args.resume)
    if not args.skip_ft:
        for s in range(1, args.steps + 1):
            run_stage(f"ft{s}", [py, f"{tools}/train_incremental.py",
                                 "-t", args.task, "-n", "FT", "-s", str(s),
                                 "--feat", "no", "--dist_type", "none", *st],
                      wd, env, resume=args.resume)
    if args.defer_eval:
        runs = ["ABR:" + mt] + ([] if args.skip_ft else ["FT"])
        run_stage("eval", [py, f"{tools}/eval_steps.py",
                           "-t", args.task, "--steps", str(args.steps),
                           "--runs", *runs,
                           "--first-config",
                           f"configs/voc/{args.task}/e2e_faster_rcnn_R_50_C4_4x.yaml"],
                  wd, env, resume=args.resume)

    print(f"[chain] total {time.time() - t_all:.0f}s; ledger:")
    ledger = os.path.join(wd, "output", f"{args.task}.txt")
    if os.path.exists(ledger):
        print(open(ledger).read())


if __name__ == "__main__":
    main()
