#!/usr/bin/env python
"""Model-family throughput matrix on the current accelerator.

bench.py reports the flagship recipe (VOC 15-5 ABR incremental, C4);
this tool sweeps every OTHER model family the framework ships — each
built at full R-50 scale through the same `build_detection_model` +
`make_train_step` dispatch the drivers use — and times one compiled
train step per family on the reference 832x1344 canvas:

  c4          Faster R-CNN R-50-C4 first-task step
  mask        + mask branch (MODEL.MASK_ON, C4 extractor)
  keypoint    + keypoint branch (MODEL.KEYPOINT_ON, 17 COCO keypoints)
  fpn         Faster R-CNN R-50-FPN (P2-P6, 2-MLP head)
  fpn_abr     R-50-FPN ABR incremental step (teacher + student + ID/ARD
              distillation — the capability the reference's machinery
              has but never shipped a recipe for)
  retinanet   RetinaNet R-50-FPN (focal loss, octave anchors)
  fbnet       FBNet 'default' arch Faster R-CNN (mobile family)

Prints one JSON line per family:
  {"family": ..., "img_per_sec_per_chip": N, "s_per_iter": N, ...}
and a final summary line. Families that fail report {"family","error"}
without aborting the sweep (so one OOM doesn't hide the rest).

Env knobs: BENCH_FAMILIES=csv subset, BENCH_MATRIX_BATCH (default 8),
BENCH_MATRIX_ITERS (default 10), BENCH_MATRIX_WARMUP (default 2).

Reference equivalents: maskrcnn_benchmark ships these families as
config variants (e2e_mask_rcnn_*, e2e_keypoint_rcnn_*, retinanet/*,
e2e_faster_rcnn_fbnet*) but records no benchmark protocol; this matrix
is the TPU framework's own coverage + perf artifact.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from abr_iod_tpu.utils.platform import respect_jax_platforms_env  # noqa: E402

respect_jax_platforms_env()

CANVAS = tuple(int(x) for x in os.environ.get(
    "BENCH_MATRIX_CANVAS", "832,1344").split(","))


def _base_cfg():
    from abr_iod_tpu.config import get_default_config, VOC_CLASSES

    cfg = get_default_config()
    cfg.MODEL.ROI_BOX_HEAD.NAME_OLD_CLASSES = VOC_CLASSES[:15]
    cfg.MODEL.ROI_BOX_HEAD.NAME_NEW_CLASSES = VOC_CLASSES[15:]
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 21
    cfg.TPU.CANVAS_TRAIN = CANVAS
    # throughput benchmark, not a learning run: random-init + synthetic
    # noise pixels at recipe LR diverge within the ~12 timed steps on the
    # 256-ch FPN families (loss ~1e15), so default to a tame LR — it has
    # no effect on step time (BENCH_MATRIX_LR to override)
    cfg.SOLVER.BASE_LR = float(os.environ.get("BENCH_MATRIX_LR", "0.0002"))
    cfg.SOLVER.WARMUP_ITERS = 0
    # BENCH_MATRIX_NMS=pallas|xla: A/B the proposal-path NMS backend
    # (cfg.TPU.NMS_BACKEND; ops/nms_pallas.py vs ops/nms.py)
    if os.environ.get("BENCH_MATRIX_NMS"):
        cfg.TPU.NMS_BACKEND = os.environ["BENCH_MATRIX_NMS"]
    # BENCH_MATRIX_FPN_ROI=gather|einsum: A/B the multi-level RoIAlign
    # realization (cfg.TPU.FPN_ROI_ALIGN_BACKEND; models/fpn.py)
    if os.environ.get("BENCH_MATRIX_FPN_ROI"):
        cfg.TPU.FPN_ROI_ALIGN_BACKEND = os.environ["BENCH_MATRIX_FPN_ROI"]
    return cfg


def _family_cfg(family):
    cfg = _base_cfg()
    if family == "mask":
        cfg.MODEL.MASK_ON = True
    elif family == "keypoint":
        cfg.MODEL.KEYPOINT_ON = True
    elif family in ("fpn", "fpn_abr"):
        if family == "fpn_abr":
            # the CLI ABR recipe's distillation knobs (tools/train_incremental
            # defaults; same values bench.py uses for the flagship) — without
            # these the config defaults (l2, no feat distill, alpha 0) time a
            # lighter step than the recipe actually runs
            cfg.DIST.TYPE = "id"
            cfg.DIST.ALPHA = 0.5
            cfg.DIST.BETA = 1.0
            cfg.DIST.GAMMA = 1.0
            cfg.DIST.FEAT = "ard"
            # even teacher-seeded, the random-init FrozenBN backbone +
            # ID/ARD gradients diverge within the timed window at the 2e-4
            # matrix default (finite warmup, NaN by iter ~6); 2e-5 holds
            # loss ~2-3 for 12 iters and step time is LR-independent
            cfg.SOLVER.BASE_LR = min(
                float(cfg.SOLVER.BASE_LR), 2e-5)
        cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
        # FPN deployments run 256-channel pyramids (upstream
        # maskrcnn-benchmark FPN configs set BACKBONE_OUT_CHANNELS: 256;
        # the 1024 default is the C4 res4 width — a 1024-ch FPN train
        # step does not fit 16G HBM at this canvas/batch)
        cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    elif family == "retinanet":
        cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
        cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
        cfg.MODEL.RETINANET_ON = True
        cfg.MODEL.RETINANET.NUM_CLASSES = 21
    elif family == "fbnet":
        cfg.MODEL.BACKBONE.CONV_BODY = "FBNet"
        cfg.MODEL.FBNET.ARCH = "default"
    return cfg


def _synth_batch(rng, cfg, batch, family):
    import jax.numpy as jnp
    import numpy as np

    from abr_iod_tpu.engine import Batch

    max_gt = int(cfg.TPU.MAX_GT)
    pixels = rng.uniform(96, 160, (batch, *CANVAS, 3)).astype(np.float32)
    sizes = np.tile(np.array([[800, 1333]], np.int32), (batch, 1))
    gt_boxes = np.zeros((batch, max_gt, 4), np.float32)
    gt_labels = np.zeros((batch, max_gt), np.int32)
    gt_mask = np.zeros((batch, max_gt), bool)
    n_cls = (int(cfg.MODEL.RETINANET.NUM_CLASSES)
             if family == "retinanet"
             else int(cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES))
    for i in range(batch):
        for j in range(6):
            x1, y1 = rng.uniform(0, 900), rng.uniform(0, 500)
            gt_boxes[i, j] = [x1, y1, x1 + rng.uniform(60, 300),
                              y1 + rng.uniform(60, 250)]
            gt_labels[i, j] = rng.randint(1, n_cls)
            gt_mask[i, j] = True
    kw = {}
    if family == "mask":
        r = int(cfg.TPU.MASK_CROP_SIZE)
        yy, xx = np.mgrid[0:r, 0:r]
        blob = (((yy - r / 2) ** 2 + (xx - r / 2) ** 2) < (r / 3) ** 2)
        kw["gt_mask_crops"] = jnp.asarray(
            np.tile(blob.astype(np.float32), (batch, max_gt, 1, 1)))
    if family == "keypoint":
        k = int(cfg.MODEL.ROI_KEYPOINT_HEAD.get("NUM_CLASSES", 17))
        kps = np.zeros((batch, max_gt, k, 3), np.float32)
        for i in range(batch):
            for j in range(6):
                x1, y1, x2, y2 = gt_boxes[i, j]
                kps[i, j, :, 0] = rng.uniform(x1, x2, k)
                kps[i, j, :, 1] = rng.uniform(y1, y2, k)
                kps[i, j, :, 2] = 2.0
        kw["gt_keypoints"] = jnp.asarray(kps)
    return Batch(
        pixels=jnp.asarray(pixels),
        sizes=jnp.asarray(sizes),
        gt_boxes=jnp.asarray(gt_boxes),
        gt_labels=jnp.asarray(gt_labels),
        gt_mask=jnp.asarray(gt_mask),
        **kw,
    )


def _run_family(family, batch_per_chip, iters, warmup):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from abr_iod_tpu.engine import TrainState, make_train_step
    from abr_iod_tpu.models.build import build_detection_model
    from abr_iod_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from abr_iod_tpu.solver.optim import make_optimizer

    n_devices = len(jax.devices())
    batch = batch_per_chip * n_devices
    cfg = _family_cfg(family)
    cfg.SOLVER.IMS_PER_BATCH = batch
    rng = np.random.RandomState(0)
    mesh = make_mesh()

    model = build_detection_model(cfg)
    px = jnp.zeros((1, *CANVAS, 3), jnp.float32)
    rois = jnp.zeros((1, 4, 4)) + jnp.asarray([0.0, 0.0, 64.0, 64.0])
    if family == "retinanet":
        params = jax.jit(model.init)(jax.random.PRNGKey(0), px)
    else:
        params = jax.jit(model.init)(jax.random.PRNGKey(0), px, rois)

    teacher_params = None
    if family == "fpn_abr":
        cfg_t = cfg.clone()
        cfg_t.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 16
        model_t = build_detection_model(cfg_t)
        teacher_params = jax.jit(model_t.init)(jax.random.PRNGKey(1), px, rois)
        # seed the student FROM the teacher (head-growth alignment), exactly
        # as tools/train_incremental.py does — with an unrelated random
        # teacher the distillation terms start ~3e3 and the step diverges
        # within the timed window; the real recipe never sees that regime
        from abr_iod_tpu.utils.checkpoint import align_and_update_params

        params = align_and_update_params(params, teacher_params)

    tx = make_optimizer(cfg, params)
    batch_data = _synth_batch(rng, cfg, batch, family)

    with jax.sharding.set_mesh(mesh):
        params = shard_params(mesh, params)
        state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        if family == "fpn_abr":
            from abr_iod_tpu.engine.incremental import make_incremental_train_step

            teacher_params = shard_params(mesh, teacher_params)
            step, _ = make_incremental_train_step(
                model_t, model, tx, cfg, CANVAS, n_old_classes=15,
                share_frozen_prefix=False)
            run = lambda st: step(st, teacher_params, batch_data)
        else:
            step, _ = make_train_step(model, tx, cfg, CANVAS)
            run = lambda st: step(st, batch_data)
        batch_data = shard_batch(mesh, batch_data)

        t_compile = time.perf_counter()
        for _ in range(warmup):
            state, metrics = run(state)
        # true sync: a host readback round-trips the remote-TPU transport
        # (block_until_ready alone can resolve early through the tunnel)
        loss0 = float(metrics["loss"])
        t_compile = time.perf_counter() - t_compile

        # BENCH_PROFILE=<dir>: xplane trace of the timed loop into
        # <dir>/<family> (aggregate with tools/analyze_xplane.py)
        prof_dir = os.environ.get("BENCH_PROFILE")
        if prof_dir:
            jax.profiler.start_trace(os.path.join(prof_dir, family))
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = run(state)
        loss = float(metrics["loss"])
        dt = time.perf_counter() - t0
        if prof_dir:
            jax.profiler.stop_trace()

    if not np.isfinite(loss):
        raise RuntimeError(
            f"non-finite loss {loss} (warmup loss {loss0}) at "
            f"BASE_LR={float(cfg.SOLVER.BASE_LR):g} — random-init + synthetic "
            "pixels diverge at recipe LRs; step time is LR-invariant, so rerun "
            "with BENCH_MATRIX_LR=2e-5 (or lower) for a finite-loss timing")
    per_chip = batch * iters / dt / n_devices
    return {
        "family": family,
        "img_per_sec_per_chip": round(per_chip, 3),
        "s_per_iter": round(dt / iters, 4),
        "batch_per_chip": batch_per_chip,
        "devices": n_devices,
        "canvas": list(CANVAS),
        "loss": round(loss, 4),
        "warmup_s": round(t_compile, 1),
    }


FAMILIES = ("c4", "mask", "keypoint", "fpn", "fpn_abr", "retinanet", "fbnet")


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    fams = tuple(
        f for f in os.environ.get("BENCH_FAMILIES", ",".join(FAMILIES)).split(",")
        if f)
    batch = int(os.environ.get("BENCH_MATRIX_BATCH", "8"))
    iters = int(os.environ.get("BENCH_MATRIX_ITERS", "10"))
    warmup = int(os.environ.get("BENCH_MATRIX_WARMUP", "2"))

    # make the LR taming visible: the matrix never times at a recipe LR
    # (random-init + noise pixels diverge within the window); this is a
    # throughput artifact, LR-invariant by measurement (BASELINE.md r4)
    lr = float(os.environ.get("BENCH_MATRIX_LR", "0.0002"))
    print(json.dumps({
        "note": f"throughput matrix runs at BASE_LR={lr:g} "
                "(fpn_abr further clamped to <=2e-5); recipe LRs diverge on "
                "random init within the timed window — step time is "
                "LR-invariant, losses here are NOT convergence evidence",
    }), flush=True)

    results = []
    for fam in fams:
        try:
            row = _run_family(fam, batch, iters, warmup)
        except Exception as e:  # report, keep sweeping
            row = {"family": fam, "error": f"{type(e).__name__}: {e}"}
        results.append(row)
        print(json.dumps(row), flush=True)
    ok = {r["family"]: r["img_per_sec_per_chip"] for r in results if "error" not in r}
    print(json.dumps({"metric": "family_matrix_img_per_sec_per_chip",
                      "value": ok, "failed": [r["family"] for r in results
                                              if "error" in r]}))


if __name__ == "__main__":
    main()
