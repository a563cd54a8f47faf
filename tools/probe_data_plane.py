#!/usr/bin/env python
"""Decompose the CLI train loop's per-iteration cost on real hardware.

Times, separately and at the flagship first-task configuration:
  1. host prep   — DetectionLoader.batches() alone (cache-cold epoch 1,
                   cache-warm epoch 2+; isolates TPU.CANVAS_CACHE_MB)
  2. H2D upload  — jax.device_put of a prepared uint8 batch, blocked
  3. device step — the jitted train step on resident data
  4. full loop   — the real overlap of 1+2+3, as the CLI runs it

Reference analogue: torch DataLoader workers + DDP step; the reference
never separates these either — this tool exists so the host/device gap
(BASELINE.md "host->device data plane") is attributed with numbers, not
guesses.

Usage (same env contract as the other tools):
  ABR_IOD_SYNTH_IMAGES=150 ABR_IOD_ALLOW_RANDOM_INIT=1 \
    python tools/probe_data_plane.py -c configs/voc/10-10/e2e_faster_rcnn_R_50_C4_4x.yaml \
      --iters 40
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from abr_iod_tpu.utils.platform import respect_jax_platforms_env  # noqa: E402

respect_jax_platforms_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config-file", required=True)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args()

    import jax
    import numpy as np

    from abr_iod_tpu.config import get_default_config
    from abr_iod_tpu.data.loader import DetectionLoader
    from abr_iod_tpu.engine.driver import (
        _device_normalize, _mesh_from_cfg, load_params, make_data_source,
    )
    from abr_iod_tpu.engine.train import TrainState, make_train_step
    from abr_iod_tpu.models.build import build_detection_model
    from abr_iod_tpu.parallel.mesh import shard_batch, shard_params
    from abr_iod_tpu.solver.optim import make_optimizer

    cfg = get_default_config()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.SOLVER.IMS_PER_BATCH = args.batch
    cfg.DATASETS.TRAIN = ["voc_rb_synthetic_train"]
    cfg.freeze()

    n = args.iters
    source = make_data_source(cfg, cfg.DATASETS.TRAIN[0], "train_new")
    loader = DetectionLoader(source, cfg, batch_size=args.batch,
                             is_train=True, seed=int(cfg.SEED),
                             normalize="device")

    # --- 1. host prep: first pass fills the canvas cache, second measures
    # the warm path.  No device involved.
    t0 = time.time()
    cold = [b for _, b in zip(range(n), loader.batches())]
    t_cold = (time.time() - t0) / len(cold)
    t0 = time.time()
    warm = [b for _, b in zip(range(n), loader.batches())]
    t_warm = (time.time() - t0) / len(warm)
    print(f"host prep  cold: {t_cold*1e3:8.1f} ms/batch "
          f"({t_cold*1e3/args.batch:.1f} ms/img)")
    print(f"host prep  warm: {t_warm*1e3:8.1f} ms/batch "
          f"({t_warm*1e3/args.batch:.1f} ms/img)")

    # --- 2. H2D upload, blocked (no compute in flight)
    mesh = _mesh_from_cfg(cfg, args.batch)
    with jax.sharding.set_mesh(mesh):
        batch = warm[0]
        nbytes = sum(np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(batch))
        g = shard_batch(mesh, batch)  # once for allocation warmup
        jax.block_until_ready(g.pixels)
        t0 = time.time()
        for b in warm[:n]:
            g = shard_batch(mesh, b)
            jax.block_until_ready(g.pixels)
        t_h2d = (time.time() - t0) / n
        print(f"H2D upload      : {t_h2d*1e3:8.1f} ms/batch "
              f"({nbytes/2**20:.1f} MB -> {nbytes/2**20/max(t_h2d,1e-9):.0f} MB/s)")

        # --- 3. device step on resident data
        model = build_detection_model(cfg)
        params = load_params(cfg, model)
        params = shard_params(mesh, params)
        tx = make_optimizer(cfg, params)
        train_step, _ = make_train_step(model, tx, cfg,
                                        tuple(cfg.TPU.CANVAS_TRAIN))
        norm = _device_normalize(cfg)
        state = TrainState(params, tx.init(params),
                           jax.numpy.asarray(0, jax.numpy.int32))
        gg = g._replace(pixels=norm(g.pixels))
        state, m = train_step(state, gg)  # compile
        jax.block_until_ready(m["loss"])
        t0 = time.time()
        for _ in range(n):
            state, m = train_step(state, gg)
        jax.block_until_ready(m["loss"])
        t_dev = (time.time() - t0) / n
        print(f"device step     : {t_dev*1e3:8.1f} ms/iter")

        # --- 4. the real loop (prefetch + put + dispatch), as the CLI runs
        it = loader.prefetched(max_batches=n + 2)
        b0 = next(it)  # spin up prefetch thread
        g = shard_batch(mesh, b0)
        state, m = train_step(state, g._replace(pixels=norm(g.pixels)))
        t0 = time.time()
        k = 0
        for b in it:
            g = shard_batch(mesh, b)
            state, m = train_step(state, g._replace(pixels=norm(g.pixels)))
            k += 1
        jax.block_until_ready(m["loss"])
        t_loop = (time.time() - t0) / max(k, 1)
        print(f"full loop       : {t_loop*1e3:8.1f} ms/iter "
              f"(overlap efficiency: "
              f"{(t_warm + t_h2d + t_dev)/max(t_loop,1e-9):.2f}x vs serial)")


if __name__ == "__main__":
    main()
