"""High-level train/eval orchestration shared by the tools/ CLIs.

This is the TPU-native analogue of the reference's per-tool ``train`` /
``do_train`` / ``test`` functions (tools/train_first_step.py:35-156,
tools/train_incremental.py:55-314, engine/trainer.py, engine/
inference.py): model construction from cfg, weight loading with head
growth, the compiled step loops, checkpointing cadence, VOC evaluation
and the ``output/{task}.txt`` per-class-AP ledger.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.catalog import DatasetCatalog, VOC_CLASSES
from ..data.loader import DetectionLoader
from ..data.voc import VOCDataSource
from ..evaluation.voc_eval import eval_detection_voc
from ..models.build import build_detection_model
from ..parallel.mesh import make_mesh, put_like, shard_batch, shard_params
from ..solver.optim import make_optimizer
from ..utils import comm
from ..utils.checkpoint import Checkpointer, align_and_update_params
from ..utils.logging import MetricLogger, ScalarWriter, setup_logger
from .incremental import make_incremental_train_step, prefix_params_equal
from .inference import make_eval_step
from .train import Batch, TrainState, make_train_step


# --------------------------------------------------------------- datasets
def _resolve_catalog(cfg):
    """The reference lets cfg.PATHS_CATALOG point at a user catalog module
    (data/build.py:145 import_file); same indirection here."""
    custom = str(cfg.get("PATHS_CATALOG", "") or "")
    if not custom:
        return DatasetCatalog
    from ..utils.misc import import_file

    return import_file("abr_iod_tpu.user_paths_catalog", custom).DatasetCatalog


def make_data_source(cfg, dataset_name: str, mode: str):
    """mode: train_new | test_all | sample_new (see data/voc.py).

    Factory dispatch mirrors the reference's data/build.py build_dataset
    over paths_catalog factories (PascalVOCDataset / COCODataset /
    PascalVOCDataset2012)."""
    spec = _resolve_catalog(cfg).get(dataset_name)
    root = spec["root"]
    factory = spec.get("factory", "PascalVOCDataset")
    if factory in ("COCODataset", "PascalVOCDataset2012"):
        # incremental split sizes come from the named class lists when the
        # config sets them; otherwise the source's own protocol defaults
        # (COCO 70+10, VOC2012 15+5)
        new_names = tuple(cfg.MODEL.ROI_BOX_HEAD.NAME_NEW_CLASSES)
        old_names = tuple(cfg.MODEL.ROI_BOX_HEAD.NAME_OLD_CLASSES)
        kwargs = dict(is_train=(mode != "test_all"))
        if new_names or old_names:
            kwargs.update(
                num_old_categories=len(old_names),
                num_new_categories=len(new_names),
            )
        if factory == "COCODataset":
            from ..data.coco import COCODataSource

            return COCODataSource(spec["ann_file"], spec["img_dir"], **kwargs)
        from ..data.voc2012_instance import VOC2012InstanceDataSource

        return VOC2012InstanceDataSource(
            spec["ann_file"], spec["img_dir"], **kwargs
        )
    if factory in ("SyntheticInstSegDataset", "SyntheticKeypointDataset"):
        # COCO-json synthetic sets (masks / person keypoints) so the mask
        # and keypoint families run through the SAME CLI surface as the
        # reference's json-backed configs (e2e_mask_rcnn_*,
        # e2e_keypoint_rcnn_*) without COCO on disk
        if not os.path.exists(os.path.join(root, f"ann_{spec['split']}.json")):
            from ..data.synthetic import make_synthetic_coco

            kp = factory == "SyntheticKeypointDataset"
            make_synthetic_coco(
                root,
                n_images=int(os.environ.get("ABR_IOD_SYNTH_IMAGES", "24")),
                image_hw=(
                    int(os.environ.get("ABR_IOD_SYNTH_H", "240")),
                    int(os.environ.get("ABR_IOD_SYNTH_W", "320")),
                ),
                keypoints=kp,
                categories=(("person",) if kp else
                            tuple(cfg.MODEL.ROI_BOX_HEAD.NAME_NEW_CLASSES)
                            or ("object",)),
            )
        new_names = tuple(cfg.MODEL.ROI_BOX_HEAD.NAME_NEW_CLASSES)
        old_names = tuple(cfg.MODEL.ROI_BOX_HEAD.NAME_OLD_CLASSES)
        if factory == "SyntheticKeypointDataset":
            from ..data.coco import COCODataSource as cls
        else:
            from ..data.voc2012_instance import VOC2012InstanceDataSource as cls
        kwargs = dict(
            is_train=(mode != "test_all"),
            num_old_categories=len(old_names),
            num_new_categories=max(len(new_names), 1),
        )
        if factory == "SyntheticKeypointDataset":
            # the person-only json reuses the COCO name but targets a
            # small head — force sorted-id contiguous labels (person=1)
            kwargs["contiguous_labels"] = True
        return cls(
            os.path.join(root, f"ann_{spec['split']}.json"),
            os.path.join(root, "img"),
            **kwargs,
        )
    if factory.startswith("Synthetic"):
        root = os.path.join(DatasetCatalog.DATA_DIR, "synthetic_voc/VOC2007")
        if not os.path.isdir(os.path.join(root, "JPEGImages")):
            from ..data.synthetic import make_synthetic_voc

            make_synthetic_voc(
                root,
                n_images=int(os.environ.get("ABR_IOD_SYNTH_IMAGES", "24")),
                image_hw=(
                    int(os.environ.get("ABR_IOD_SYNTH_H", "240")),
                    int(os.environ.get("ABR_IOD_SYNTH_W", "320")),
                ),
                mixed_orientations=os.environ.get("ABR_IOD_SYNTH_MIXED") == "1",
            )
        spec = {"split": "trainval" if mode != "test_all" else "test"}
    return VOCDataSource(
        root,
        spec["split"],
        mode,
        old_classes=tuple(cfg.MODEL.ROI_BOX_HEAD.NAME_OLD_CLASSES),
        new_classes=tuple(cfg.MODEL.ROI_BOX_HEAD.NAME_NEW_CLASSES),
        excluded_classes=tuple(cfg.MODEL.ROI_BOX_HEAD.NAME_EXCLUDED_CLASSES),
        keep_difficult=(mode == "test_all"),
    )


# --------------------------------------------------------------- params
def init_params(cfg, model, seed: Optional[int] = None):
    canvas = tuple(cfg.TPU.CANVAS_TRAIN)
    pixels = jnp.zeros((1, canvas[0], canvas[1], 3), jnp.float32)
    key = jax.random.PRNGKey(seed if seed is not None else int(cfg.SEED))
    # jit the init: eager init dispatches hundreds of ops one-by-one,
    # which is pathologically slow through remote-dispatch TPU tunnels
    if getattr(model, "is_retinanet", False):
        # single-stage: no RoI argument in the apply surface
        return jax.jit(model.init)(key, pixels)
    rois = jnp.zeros((1, 4, 4)) + jnp.asarray([0.0, 0.0, 32.0, 32.0])
    return jax.jit(model.init)(key, pixels, rois)


def find_local_pretrained(wdir: Optional[str] = None) -> Optional[str]:
    """Local pretrained-backbone file for catalog:// entries (zero-egress
    substitute for the reference's Detectron S3 download,
    utils/checkpoint.py:120-142).  Single source of truth for the
    candidate names — __graft_entry__ and load_params both probe here."""
    wdir = wdir or os.environ.get("ABR_IOD_WEIGHTS_DIR", "weights")
    for cand in ("R-50.pkl", "resnet50.pth", "resnet50.pt"):
        local = os.path.join(wdir, cand)
        if os.path.exists(local):
            return local
    return None


def _device_normalize(cfg):
    """Normalize-on-device fn for uint8 canvases (loaders constructed with
    normalize="device"): the host ships bytes — 4x less host→device
    traffic than normalized f32 — and this jit does uint8→f32 + BGR +
    mean-subtract, bit-identical to the host transforms.normalize."""
    from ..data.transforms import make_device_normalize

    return make_device_normalize(
        cfg.INPUT.PIXEL_MEAN, bool(cfg.INPUT.TO_BGR255)
    )


def _make_pixel_bank(cfg, mesh, source, logger=None):
    """Device-resident canvas bank for the train pixel plane (see
    data/device_cache.py).  None when disabled, multi-process, or the
    recipe jitters (the loader gates on its own cache path anyway)."""
    budget = float(cfg.TPU.get("DEVICE_CANVAS_CACHE_MB", 0))
    if budget <= 0 or jax.process_count() > 1:
        return None
    from ..data.device_cache import DeviceCanvasBank
    from ..parallel.mesh import batch_sharding

    ms = cfg.INPUT.MIN_SIZE_TRAIN
    n_scales = len(ms) if isinstance(ms, (list, tuple)) else 1
    n_flip = 2 if float(cfg.INPUT.FLIP_PROB_TRAIN) > 0 else 1
    hint = len(source) * max(n_scales, 1) * n_flip
    bank = DeviceCanvasBank(
        budget, tuple(cfg.TPU.CANVAS_TRAIN),
        dual_orientation=bool(cfg.TPU.get("DUAL_ORIENTATION", True)),
        out_sharding=batch_sharding(mesh), max_keys_hint=hint,
    )
    if logger is not None:
        logger.info(
            f"device canvas bank: {budget:.0f} MB/orientation "
            f"(≤{hint} keys) — pixel batches assemble on device, only "
            f"cache misses cross the host link (TPU.DEVICE_CANVAS_CACHE_MB)"
        )
    return bank


def _missing_weight_fallback(fresh, why: str, logger):
    """A configured-but-missing weight file is a recipe divergence (the run
    would silently train from random init and wreck mAP), so it is an error
    unless explicitly allowed (tests / synthetic runs set
    ABR_IOD_ALLOW_RANDOM_INIT=1)."""
    if os.environ.get("ABR_IOD_ALLOW_RANDOM_INIT") == "1":
        if logger:
            logger.warning(f"{why} — random init (ABR_IOD_ALLOW_RANDOM_INIT=1)")
        return fresh
    raise FileNotFoundError(
        f"{why}. Refusing to silently train from random init; provide the "
        "weights (ABR_IOD_WEIGHTS_DIR for catalog:// entries) or set "
        "ABR_IOD_ALLOW_RANDOM_INIT=1 for synthetic/test runs."
    )


def load_params(cfg, model, logger=None, weight_path: Optional[str] = None):
    """Init + optional checkpoint load with head-growth alignment
    (reference: utils/model_serialization.py:10-91)."""
    fresh = init_params(cfg, model)
    path = weight_path if weight_path is not None else str(cfg.MODEL.WEIGHT)
    if not path:
        if logger:
            logger.info("no MODEL.WEIGHT — training from random init")
        return fresh
    log_fn = logger.info if logger else None

    if path.startswith("catalog://"):
        local = find_local_pretrained()
        if local is not None:
            path = local
        else:
            wdir = os.environ.get("ABR_IOD_WEIGHTS_DIR", "weights")
            return _missing_weight_fallback(
                fresh, f"{path}: no local pretrained file under {wdir!r}", logger
            )

    if not os.path.exists(path):
        return _missing_weight_fallback(fresh, f"weight file {path!r} not found", logger)

    if path.endswith((".pkl", ".pth", ".pt")):
        from ..utils.weight_converter import load_pretrained_backbone

        tree = load_pretrained_backbone(path)
        return align_and_update_params(fresh, {"params": tree}, log_fn=log_fn)

    payload = Checkpointer.load_file(path)
    old = payload["params"] if "params" in payload else payload
    return align_and_update_params(fresh, old, log_fn=log_fn)


def _mesh_from_cfg(cfg, batch_size: Optional[int] = None):
    import math

    n_model = int(cfg.TPU.MESH_MODEL)
    n_data = int(cfg.TPU.MESH_DATA)
    if n_data <= 0:
        n_data = max(len(jax.devices()) // n_model, 1)
        if batch_size is not None and batch_size % n_data != 0:
            # batch must divide over the data axis; fall back to the
            # largest compatible mesh rather than crashing — but say so
            # LOUDLY: a 7-image batch on 8 devices would otherwise run
            # 1-wide data parallelism in silence
            shrunk = math.gcd(batch_size, n_data)
            logging.getLogger("abr_iod_tpu").warning(
                f"SOLVER.IMS_PER_BATCH={batch_size} does not divide the "
                f"{n_data}-device data axis; shrinking the mesh to "
                f"{shrunk}-wide data parallelism ({n_data - shrunk} device(s) "
                "idle). Pick a batch size divisible by the device count, or "
                "set TPU.MESH_DATA explicitly."
            )
            n_data = shrunk
    return make_mesh(n_data, n_model)




def _maybe_profile(it: int, logger):
    """jax.profiler trace hook (reference kept a commented-out
    torch.profiler block, engine/trainer.py:63-71 — here it's a real
    switch): set ABR_IOD_PROFILE=<dir> to capture iterations 10-12."""
    prof_dir = os.environ.get("ABR_IOD_PROFILE")
    if not prof_dir:
        return
    if it == 10:
        jax.profiler.start_trace(prof_dir)
        if logger:
            logger.info(f"profiler trace started → {prof_dir}")
    elif it == 13:
        jax.profiler.stop_trace()
        if logger:
            logger.info("profiler trace stopped")


def _log_memory(logger):
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and logger:
            used = stats.get("bytes_in_use", 0) / 1e6
            peak = stats.get("peak_bytes_in_use", 0) / 1e6
            logger.info(f"device memory: {used:.0f}MB in use, {peak:.0f}MB peak")
    except Exception:
        pass


def _restore_or_init_state(checkpointer, tx, params, logger):
    """Implicit resume from the last_checkpoint pointer (reference
    utils/checkpoint.py:54-95 + engine/trainer.py:57-58): restores
    params, optimizer state and iteration when a resumable checkpoint
    exists in OUTPUT_DIR."""
    opt_state = tx.init(params)
    start_iter = 0
    if checkpointer.has_checkpoint():
        try:
            payload = checkpointer.load(
                {"params": params, "opt_state": opt_state, "iteration": 0}
            )
            # re-commit the restored host arrays onto the live templates'
            # shardings (collective-free at any world size)
            params = put_like(payload["params"], params)
            opt_state = put_like(payload["opt_state"], opt_state)
            start_iter = int(payload["iteration"])
            if logger:
                logger.info(f"resumed from iteration {start_iter}")
        except Exception as e:  # params-only checkpoint (e.g. trimmed)
            if logger:
                logger.info(f"no resumable optimizer state ({e}); fresh start")
    return TrainState(params, opt_state, jnp.asarray(start_iter, jnp.int32)), start_iter


def _shard_kwargs(batch_size: int):
    """Per-process loader sharding (reference: make_data_loader's
    DistributedSampler + images_per_gpu = IMS_PER_BATCH // num_gpus,
    data/build.py:109-169).  IMS_PER_BATCH is the GLOBAL batch; each
    process loads its slice of every orientation-grouped global batch."""
    n = jax.process_count()
    if batch_size % n != 0:
        raise ValueError(
            f"IMS_PER_BATCH={batch_size} must divide over {n} processes"
        )
    return dict(
        batch_size=batch_size // n,
        num_shards=n,
        shard_index=jax.process_index(),
    )


# --------------------------------------------------------------- training

def run_first_task_training(cfg, logger=None, max_iter_override=None):
    """First-task / joint training (tools/train_first_step.py:35-116)."""
    logger = logger or setup_logger("abr_iod_tpu.first", cfg.OUTPUT_DIR)
    from ..utils.misc import collect_env_info

    logger.info("environment:\n" + collect_env_info())
    mesh = _mesh_from_cfg(cfg, int(cfg.SOLVER.IMS_PER_BATCH))
    model = build_detection_model(cfg)
    params = load_params(cfg, model, logger)

    tx = make_optimizer(cfg, params)
    checkpointer = Checkpointer(
        cfg.OUTPUT_DIR, async_saves=bool(cfg.TPU.ASYNC_CHECKPOINT))
    writer = ScalarWriter(cfg.TENSORBOARD_DIR)
    canvas = tuple(cfg.TPU.CANVAS_TRAIN)

    source = make_data_source(cfg, cfg.DATASETS.TRAIN[0], "train_new")
    px_bank = _make_pixel_bank(cfg, mesh, source, logger)
    loader = DetectionLoader(
        source, cfg, is_train=True, seed=int(cfg.SEED), normalize="device",
        pixel_bank=px_bank,
        **_shard_kwargs(int(cfg.SOLVER.IMS_PER_BATCH)),
    )
    px_bank = loader.pixel_bank  # loader drops the bank when jitter is on
    norm_px = _device_normalize(cfg)
    max_iter = int(max_iter_override or cfg.SOLVER.MAX_ITER)
    checkpoint_period = int(cfg.SOLVER.CHECKPOINT_PERIOD)

    with jax.sharding.set_mesh(mesh):
        params = shard_params(mesh, params)
        state, start_iter = _restore_or_init_state(checkpointer, tx, params, logger)
        train_step, _ = make_train_step(model, tx, cfg, canvas)

        meters = MetricLogger()
        t0 = time.time()
        last = t0
        last_it = start_iter
        loader.start_iter = start_iter
        remaining = max(max_iter - start_iter, 0)
        for it, batch in enumerate(loader.prefetched(max_batches=remaining),
                                   start_iter + 1):
            if px_bank is not None:
                batch, keys, canvases = batch
                g = shard_batch(mesh, batch)  # pixels=None passes through
                g = g._replace(pixels=norm_px(px_bank.batch(keys, canvases)))
            else:
                g = shard_batch(mesh, batch)
                g = g._replace(pixels=norm_px(g.pixels))
            state, metrics = train_step(state, g)
            _maybe_profile(it, logger)
            if it % 20 == 0 or it == max_iter:
                m = {k: float(v) for k, v in metrics.items()}
                now = time.time()
                # window = iterations since the previous meter update —
                # correct at it == max_iter when max_iter % 20 != 0 (the
                # first window still folds the jit compile in, as labeled)
                meters.update(**m, time=(now - last) / max(it - last_it, 1))
                last, last_it = now, it
                if it % 100 == 0 or it == max_iter:
                    logger.info(f"iter {it}/{max_iter}  {meters}")
                    for k, v in m.items():
                        writer.add_scalar(k, v, it)
            if it % checkpoint_period == 0:
                checkpointer.save(
                    "model_last",
                    {"params": jax.device_get(state.params),
                     "opt_state": jax.device_get(state.opt_state),
                     "iteration": it},
                )
        params_final = jax.device_get(state.params)
        opt_final = jax.device_get(state.opt_state)
        _log_memory(logger)
    # model_final keeps opt_state so the last_checkpoint pointer it writes is
    # genuinely resumable (a re-run of a finished job restores iteration ==
    # max_iter and no-ops instead of retraining from scratch)
    checkpointer.save("model_final", {"params": params_final,
                                      "opt_state": opt_final,
                                      "iteration": max_iter})
    checkpointer.save("model_trimmed", {"params": params_final}, trim=True)
    checkpointer.wait()  # all checkpoint IO on disk before we hand off
    logger.info(f"training done in {time.time() - t0:.1f}s")
    return params_final


def run_incremental_training(cfg_source, cfg_target, logger=None,
                             max_iter_override=None):
    """ABR incremental step (tools/train_incremental.py:184-249)."""
    logger = logger or setup_logger("abr_iod_tpu.incremental", cfg_target.OUTPUT_DIR)
    from ..utils.misc import collect_env_info

    logger.info("environment:\n" + collect_env_info())
    mesh = _mesh_from_cfg(cfg_target, int(cfg_target.SOLVER.IMS_PER_BATCH))
    model_teacher = build_detection_model(cfg_source)
    model_student = build_detection_model(cfg_target)

    teacher_params = load_params(cfg_source, model_teacher, logger)
    student_params = load_params(cfg_target, model_student, logger)

    tx = make_optimizer(cfg_target, student_params)
    checkpointer = Checkpointer(
        cfg_target.OUTPUT_DIR,
        async_saves=bool(cfg_target.TPU.ASYNC_CHECKPOINT))
    writer = ScalarWriter(cfg_target.TENSORBOARD_DIR)
    canvas = tuple(cfg_target.TPU.CANVAS_TRAIN)
    n_old = len(tuple(cfg_target.MODEL.ROI_BOX_HEAD.NAME_OLD_CLASSES))

    # data: ABR (with device crop bank) when MEM_BUFF is set, else finetune
    use_mem = cfg_target.MEM_BUFF not in (None, 0, False)
    source = make_data_source(cfg_target, cfg_target.DATASETS.TRAIN[0], "train_new")
    shard_kw = _shard_kwargs(int(cfg_target.SOLVER.IMS_PER_BATCH))
    max_iter = int(max_iter_override or cfg_target.SOLVER.MAX_ITER)
    checkpoint_period = int(cfg_target.SOLVER.CHECKPOINT_PERIOD)

    if use_mem:
        from ..data.abr_fusion import make_abr_batch_fn
        from ..memory.rehearsal import Mem, load_crop_bank

        mem = Mem(cfg_target, step=int(cfg_target.get("STEP", 1)),
                  img_root=source.root)
        mem_path = mem.current_mem_path or mem.first_mem_path
        bank = load_crop_bank(mem_path, tuple(cfg_target.TPU.CROP_BANK_HW))
        fuse = make_abr_batch_fn(cfg_target, bank)
        px_bank = _make_pixel_bank(cfg_target, mesh, source, logger)
        loader = DetectionLoader(source, cfg_target, is_train=True,
                                 seed=int(cfg_target.SEED), normalize=False,
                                 pixel_bank=px_bank, **shard_kw)
        px_bank = loader.pixel_bank

        def batch_iter():
            # background-thread the host decode/resize so it overlaps the
            # device step (the reference used DataLoader worker processes)
            from itertools import islice

            from ..data.loader import prefetch_iter

            k = jax.random.PRNGKey(int(cfg_target.SEED) + 1)
            for raw in prefetch_iter(
                    islice(loader.raw_batches(), max_iter),
                    depth=int(cfg_target.TPU.PREFETCH_DEPTH),
                    on_drop=(loader.bank_drop if px_bank is not None
                             else None)):
                k, sub = jax.random.split(k)
                if px_bank is not None:
                    raw, keys, canvases = raw
                    px = px_bank.batch(keys, canvases)
                    yield fuse(px, *[jnp.asarray(x) for x in raw[1:]], sub)
                else:
                    yield fuse(*[jnp.asarray(x) for x in raw], sub)

        batches = batch_iter()
        norm_px = None  # the fused batch is already normalized on device
    else:
        px_bank = _make_pixel_bank(cfg_target, mesh, source, logger)
        loader = DetectionLoader(source, cfg_target, is_train=True,
                                 seed=int(cfg_target.SEED),
                                 normalize="device",
                                 pixel_bank=px_bank, **shard_kw)
        px_bank = loader.pixel_bank
        batches = loader.prefetched(max_batches=max_iter)
        norm_px = _device_normalize(cfg_target)

    with jax.sharding.set_mesh(mesh):
        teacher_params = shard_params(mesh, teacher_params)
        student_params = shard_params(mesh, student_params)
        state, start_iter = _restore_or_init_state(
            checkpointer, tx, student_params, logger
        )
        # gate on the params that will actually train (a RESUMED state could
        # carry a prefix from a different source checkpoint than this run's
        # teacher — check the restored tree, not the freshly-loaded one)
        share_prefix = bool(cfg_target.TPU.get("SHARE_FROZEN_PREFIX", True)) and (
            prefix_params_equal(state.params, teacher_params, cfg_target)
        )
        if share_prefix:
            logger.info(
                "teacher/student frozen backbone prefix is value-identical — "
                "computing it once per step (TPU.SHARE_FROZEN_PREFIX)"
            )
        step_fn, _ = make_incremental_train_step(
            model_teacher, model_student, tx, cfg_target, canvas, n_old,
            share_frozen_prefix=share_prefix,
        )
        meters = MetricLogger()
        t0 = time.time()
        last = t0
        last_it = start_iter
        for it, batch in enumerate(batches, start_iter + 1):
            if it > max_iter:
                break
            if norm_px is not None and px_bank is not None:
                batch, keys, canvases = batch
                g = shard_batch(mesh, batch)
                g = g._replace(pixels=norm_px(px_bank.batch(keys, canvases)))
            else:
                g = shard_batch(mesh, batch)
                if norm_px is not None:
                    g = g._replace(pixels=norm_px(g.pixels))
            state, metrics = step_fn(state, teacher_params, g)
            _maybe_profile(it, logger)
            if it % 20 == 0 or it == max_iter:
                m = {k: float(v) for k, v in metrics.items()}
                now = time.time()
                m["time"] = (now - last) / max(it - last_it, 1)
                last, last_it = now, it
                meters.update(**m)
                if it % 100 == 0 or it == max_iter:
                    logger.info(f"iter {it}/{max_iter}  {meters}")
                    for k, v in m.items():
                        writer.add_scalar(k, v, it)
            if it % checkpoint_period == 0:
                checkpointer.save(
                    "model_last",
                    {"params": jax.device_get(state.params),
                     "opt_state": jax.device_get(state.opt_state),
                     "iteration": it},
                )
        params_final = jax.device_get(state.params)
        opt_final = jax.device_get(state.opt_state)
    checkpointer.save("model_final", {"params": params_final,
                                      "opt_state": opt_final,
                                      "iteration": max_iter})
    checkpointer.save("model_trimmed", {"params": params_final}, trim=True)
    checkpointer.wait()  # all checkpoint IO on disk before we hand off
    logger.info(f"incremental training done in {time.time() - t0:.1f}s")
    return params_final


# --------------------------------------------------------------- eval
def run_test(cfg, params=None, logger=None, max_images=None,
             pixel_bank=None):
    """VOC evaluation (tools/train_incremental.py:252-314): runs the
    compiled eval step over DATASETS.TEST, maps detections back to
    original coordinates, computes mAP, appends per-class APs to
    output/{TASK}.txt.

    ``pixel_bank``: optional DeviceCanvasBank shared across run_test
    calls (tools/eval_steps.py) — multi-step chains re-evaluate the SAME
    test canvases once per step; with a shared bank the pixels cross the
    host link once and later evals assemble batches HBM→HBM.  Hits are
    bit-identical by construction (bank keys mirror the host canvas
    cache), so mAP digits are unchanged."""
    logger = logger or setup_logger("abr_iod_tpu.test", cfg.OUTPUT_DIR)
    model = build_detection_model(cfg)
    if params is None:
        # prefer the just-trained checkpoint in OUTPUT_DIR (the reference's
        # Checkpointer.load does the same via the last_checkpoint pointer,
        # utils/checkpoint.py:54-58)
        ck = Checkpointer(cfg.OUTPUT_DIR)
        last = ck.last_checkpoint_path()
        params = load_params(cfg, model, logger, weight_path=last)

    canvas = tuple(cfg.TPU.CANVAS_TEST)
    eval_step, _ = make_eval_step(model, cfg, canvas)
    # the reference loops over all DATASETS.TEST entries
    # (tools/train_incremental.py:303-307); predictions accumulate across
    # datasets for one combined mAP like its per-dataset inference calls
    sources = [
        make_data_source(cfg, name, "test_all") for name in tuple(cfg.DATASETS.TEST)
    ]
    if len(sources) == 1:
        source = sources[0]
    else:
        from ..data.concat import ConcatDataSource

        source = ConcatDataSource(sources)
    loader = DetectionLoader(
        source, cfg, is_train=False, canvas=canvas, flip=False,
        normalize="device", pixel_bank=pixel_bank,
        **_shard_kwargs(int(cfg.TEST.IMS_PER_BATCH)),
    )
    pixel_bank = loader.pixel_bank
    norm_px = _device_normalize(cfg)

    mask_on = bool(cfg.MODEL.MASK_ON)
    keypoint_on = bool(cfg.MODEL.KEYPOINT_ON)
    predictions, ground_truths = [], []
    seg_predictions, seg_ground_truths = [], []
    n_done = 0
    t0 = time.time()

    def _consume(fetched, sizes, records, n_valid):
        boxes, scores, labels, valid, mask_probs, kp_maps_host = fetched
        for i in range(n_valid):
            rec = records[i]
            nh, nw = sizes[i]
            sx = rec["width"] / float(nw)
            sy = rec["height"] / float(nh)
            v = valid[i]
            b = boxes[i][v] * np.array([sx, sy, sx, sy])
            pred = {"boxes": b, "labels": labels[i][v], "scores": scores[i][v]}
            if kp_maps_host is not None:
                # exact reference decode (cv2 upsample + sub-bin argmax)
                # on the NETWORK-frame boxes — the reference's Keypointer
                # runs BEFORE the BoxList resize (so the cv2 grid uses the
                # resized-image box size) and only the decoded x/y are
                # then linearly rescaled (structures/keypoint.py resize)
                from ..models.keypoint_head import heatmaps_to_keypoints_np

                kp = heatmaps_to_keypoints_np(kp_maps_host[i][v], boxes[i][v])
                kp[..., 0] *= sx
                kp[..., 1] *= sy
                pred["keypoints"] = kp
            predictions.append(pred)
            gt_rec = {"boxes": rec["boxes"], "labels": rec["labels"],
                      "difficult": rec["difficult"]}
            if "iscrowd" in rec:
                # crowd ignore regions for the COCO protocol
                gt_rec["iscrowd"] = rec["iscrowd"]
            if "areas" in rec:
                # json segmentation areas for the S/M/L buckets
                gt_rec["areas"] = rec["areas"]
            ground_truths.append(gt_rec)
            if mask_on and rec.get("masks") is not None:
                from ..structures.masks import paste_masks_in_image

                hw = (int(rec["height"]), int(rec["width"]))
                seg_predictions.append({
                    "masks": paste_masks_in_image(
                        mask_probs[i][v], b, hw,
                        threshold=float(
                            cfg.MODEL.ROI_MASK_HEAD.POSTPROCESS_MASKS_THRESHOLD
                        ),
                    ),
                    "labels": labels[i][v],
                    "scores": scores[i][v],
                    "boxes": b,  # the instance protocol's box AP side
                })
                seg_ground_truths.append(
                    {"masks": np.asarray(rec["masks"], bool),
                     "labels": rec["labels"],
                     "boxes": rec["boxes"]}
                )
        return n_valid

    # software-pipelined eval: the prefetch thread assembles batch k+1's
    # canvases while eval_step(k) runs, and batch k's single device_get
    # (ONE transfer for all result arrays) + host postprocess overlap
    # eval_step(k+1).  The one-batch pending window also bounds the
    # dispatch queue, which keeps slow transports well-behaved (see
    # BASELINE.md round-4 data-plane notes).  The reference's eval loop
    # is fully serial per image (engine/inference.py:43-101).
    limit = (-(-max_images // comm.get_world_size())) if max_images else None
    pending = None
    stop = False
    from ..data.loader import prefetch_iter

    for item in prefetch_iter(
            loader.eval_batches(),
            on_drop=loader.bank_drop if pixel_bank is not None else None):
        if pixel_bank is not None:
            batch, records, n_valid, keys, canvases = item
            px = pixel_bank.batch(keys, canvases)
        else:
            batch, records, n_valid = item
            px = jnp.asarray(batch.pixels)
        out = eval_step(params, norm_px(px), jnp.asarray(batch.sizes))
        if mask_on:
            dets, mask_probs = out
            det_kps = None
        elif keypoint_on:
            dets, det_kps = out
            mask_probs = None
        else:
            dets, mask_probs, det_kps = out, None, None
        handle = (dets.boxes, dets.scores, dets.labels, dets.valid,
                  mask_probs, det_kps)
        if pending is not None:
            n_done += _consume(jax.device_get(pending[0]), *pending[1:])
            if n_done <= pending[3] or n_done % 400 < pending[3]:
                # first line ≈ compile + pipeline fill; later lines the rate
                logger.info(f"eval progress: {n_done} images "
                            f"({(time.time() - t0) / max(n_done, 1):.3f} s/img)")
            if limit and n_done >= limit:
                stop = True
                break
        pending = (handle, batch.sizes, records, n_valid)
    if pending is not None and not stop:
        n_done += _consume(jax.device_get(pending[0]), *pending[1:])
    # multi-host eval: gather per-host predictions (the reference's
    # all_gather was defined but disabled, engine/inference.py:136-137)
    if comm.get_world_size() > 1:
        gathered = comm.all_gather_objects(
            (predictions, ground_truths, seg_predictions, seg_ground_truths)
        )
        predictions = [p for g in gathered for p in g[0]]
        ground_truths = [g_ for g in gathered for g_ in g[1]]
        seg_predictions = [p for g in gathered for p in g[2]]
        seg_ground_truths = [g_ for g in gathered for g_ in g[3]]
    # protocol dispatch like the reference's per-dataset evaluation
    # (data/datasets/evaluation/__init__.py): COCO-json datasets score
    # with the COCO protocol, everything else with VOC AP
    catalog = _resolve_catalog(cfg)

    def _factory_of(n):
        try:
            return catalog.get(n).get("factory", "PascalVOCDataset")
        except Exception:
            return "PascalVOCDataset"

    factories = {_factory_of(n) for n in tuple(cfg.DATASETS.TEST)}
    if factories == {"COCODataset"}:
        from ..evaluation.coco_eval import eval_detection_coco

        coco = eval_detection_coco(predictions, ground_truths)
        logger.info(
            "COCO eval: " + "  ".join(
                f"{k}={coco[k]:.4f}" for k in
                ("AP", "AP50", "AP75", "APs", "APm", "APl",
                 "AR1", "AR10", "AR100", "ARs", "ARm", "ARl")
            )
        )
        # keep the VOC-shaped surface for the ledger/gate: map = AP50
        # (the VOC-protocol comparable number — IoU .5, matching the
        # reference's VOC tables); the per-class vector and the full
        # COCO suite (IoU-averaged AP etc.) ride alongside in 'coco'
        n_lab = max(coco["per_class"], default=0) + 1
        ap = np.full(n_lab, np.nan)
        for l, v in coco["per_class"].items():
            ap[l] = v
        result = {"map": coco["AP50"], "ap": ap, "coco": coco}
    else:
        # the VOC protocol has no ignore-region concept: crowd entries
        # (present when a COCODataset rides in a mixed TEST tuple) must
        # not count as mandatory positives
        def _drop_crowd(g):
            if "iscrowd" not in g or not np.any(g["iscrowd"]):
                return g
            keep = ~np.asarray(g["iscrowd"], bool)
            return {"boxes": g["boxes"][keep], "labels": g["labels"][keep],
                    "difficult": g["difficult"][keep]}

        result = eval_detection_voc(
            predictions, [_drop_crowd(g) for g in ground_truths])
    if seg_predictions:
        # instance-seg AP alongside box AP (reference voc_eval_inst)
        from ..evaluation.voc_eval_inst import eval_instance_seg_voc

        seg_result = eval_instance_seg_voc(seg_predictions, seg_ground_truths)
        logger.info(
            f"instance-seg mAP IS={seg_result['map']:.4f}"
            + (f" (@.5={seg_result['map50']:.4f})"
               if "map50" in seg_result else "")
            + (f"  mAP OD={seg_result['map_box']:.4f}"
               if "map_box" in seg_result else "")
        )
        result["segm"] = seg_result
    dt = time.time() - t0
    logger.info(
        f"eval: {n_done} images in {dt:.1f}s ({dt / max(n_done,1):.3f} s/img), "
        f"mAP={result['map']:.4f}"
    )
    # class names: the data source's own labeling when it carries one
    # (COCO-json sources), the VOC list otherwise
    label_names = getattr(source, "label_names", None)

    def _name(l):
        if label_names and l < len(label_names):
            return label_names[l]
        return VOC_CLASSES[l - 1] if l - 1 < len(VOC_CLASSES) else f"class{l}"

    per_class = {
        _name(l): float(result["ap"][l])
        for l in range(1, len(result["ap"]))
        if not np.isnan(result["ap"][l])
    }
    logger.info("per-class AP: " + ", ".join(f"{k}={v:.3f}" for k, v in per_class.items()))

    # per-eval result file (reference voc_eval.py:52-55 writes result.txt
    # with the mAP summary + the raw AP vector into the output folder);
    # multi-process: every rank holds the gathered result but only rank 0
    # writes files (the reference evals on rank 0 only,
    # tools/train_incremental.py:253-254)
    if cfg.OUTPUT_DIR and comm.is_main_process():
        os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
        with open(os.path.join(cfg.OUTPUT_DIR, "result.txt"), "w") as fid:
            fid.write(f"mAP: {result['map']:.4f}\n")
            fid.write(",".join(str(x) for x in np.asarray(result["ap"]).tolist()))

    # optional regression gate (the reference wires TEST.EXPECTED_RESULTS
    # only on the COCO path, coco_eval.py:436; here it guards VOC too)
    expected = tuple(cfg.TEST.EXPECTED_RESULTS or ())
    if expected:
        from ..evaluation.coco_eval import check_expected_results

        check_expected_results(
            {"map": result["map"]}, expected,
            float(cfg.TEST.EXPECTED_RESULTS_SIGMA_TOL),
        )

    task = cfg.get("TASK", None)
    if task and comm.is_main_process():
        os.makedirs("output", exist_ok=True)
        with open(os.path.join("output", f"{task}.txt"), "a") as fid:
            fid.write(str(cfg.get("NAME", "EXP")))
            fid.write(",")
            fid.write(str(cfg.get("STEP", 0)))
            fid.write(",")
            fid.write(",".join(str(x) for x in result["ap"][1:]))
            fid.write("\n")
    return result
