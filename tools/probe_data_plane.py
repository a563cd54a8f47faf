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

from abr_iod_tpu.utils.platform import (
    enable_persistent_compile_cache, respect_jax_platforms_env)  # noqa: E402

respect_jax_platforms_env()
enable_persistent_compile_cache()


def probe_eval(args):
    """Eval-plane decomposition: host prep / resident eval_step / the
    serial upload+eval+readback chain / the driver's pipelined loop."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from abr_iod_tpu.config import get_default_config
    from abr_iod_tpu.data.loader import DetectionLoader, prefetch_iter
    from abr_iod_tpu.engine.driver import (
        _device_normalize, _mesh_from_cfg, _shard_kwargs, load_params,
        make_data_source,
    )
    from abr_iod_tpu.engine.inference import make_eval_step
    from abr_iod_tpu.models.build import build_detection_model

    cfg = get_default_config()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.TEST.IMS_PER_BATCH = args.batch
    cfg.freeze()
    canvas = tuple(cfg.TPU.CANVAS_TEST)
    source = make_data_source(cfg, cfg.DATASETS.TEST[0], "test_all")
    mesh = _mesh_from_cfg(cfg, args.batch)

    def loader():
        return DetectionLoader(source, cfg, is_train=False, canvas=canvas,
                               flip=False, normalize="device",
                               **_shard_kwargs(args.batch))

    norm = _device_normalize(cfg)
    with jax.sharding.set_mesh(mesh):
        model = build_detection_model(cfg)
        params = load_params(cfg, model)
        eval_step, _ = make_eval_step(model, cfg, canvas)
        t0 = time.time()
        batches = []
        for batch, _records, _nv in loader().eval_batches():
            batches.append(batch)
            if len(batches) >= args.iters:
                break
        print(f"host prep       : {(time.time()-t0)/len(batches)*1e3:8.1f} "
              f"ms/batch")
        b0 = batches[0]
        px = norm(jnp.asarray(b0.pixels))
        sz = jnp.asarray(b0.sizes)
        jax.block_until_ready(px)
        t0 = time.time()
        out = eval_step(params, px, sz)
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        print(f"compile + first : {time.time()-t0:8.1f} s")
        t0 = time.time()
        for _ in range(10):
            out = eval_step(params, px, sz)
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        print(f"eval resident   : {(time.time()-t0)/10*1e3:8.1f} ms/batch "
              f"({args.batch/((time.time()-t0)/10):.0f} img/s/chip)")
        t0 = time.time()
        for batch in batches:
            out = eval_step(params, norm(jnp.asarray(batch.pixels)),
                            jnp.asarray(batch.sizes))
            jax.device_get(jax.tree_util.tree_leaves(out))
        dt = (time.time() - t0) / len(batches)
        print(f"serial chain    : {dt*1e3:8.1f} ms/batch "
              f"(upload+eval+readback, {dt/args.batch*1e3:.0f} ms/img)")
        # the driver's software pipeline (prefetch + one-batch pending)
        pending = None
        k = 0
        t0 = time.time()
        for batch, _r, _nv in prefetch_iter(loader().eval_batches()):
            out = eval_step(params, norm(jnp.asarray(batch.pixels)),
                            jnp.asarray(batch.sizes))
            if pending is not None:
                jax.device_get(jax.tree_util.tree_leaves(pending))
                k += 1
            pending = out
            if k >= args.iters:
                break
        if pending is not None:
            jax.device_get(jax.tree_util.tree_leaves(pending))
            k += 1
        dt = (time.time() - t0) / max(k, 1)
        print(f"pipelined loop  : {dt*1e3:8.1f} ms/batch "
              f"({dt/args.batch*1e3:.0f} ms/img)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config-file", required=True)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--mode", choices=("train", "eval"), default="train")
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args()
    if args.mode == "eval":
        return probe_eval(args)

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
    # the warm path.  No device involved.  Batches are NOT retained:
    # holding every 27 MB pixel batch alive forces a fresh mmap (and its
    # page-fault storm) per np.stack, inflating prep ~5x vs the real
    # loop, where freed batches let glibc recycle the same arena block.
    def drain(it, keep_last=False):
        last = None
        for b in it:
            last = b if keep_last else None
        return last

    t0 = time.time()
    drain(loader.batches(max_batches=n))
    t_cold = (time.time() - t0) / n
    t0 = time.time()
    last = drain(loader.batches(max_batches=n), keep_last=True)
    t_warm = (time.time() - t0) / n
    print(f"host prep  cold: {t_cold*1e3:8.1f} ms/batch "
          f"({t_cold*1e3/args.batch:.1f} ms/img)")
    print(f"host prep  warm: {t_warm*1e3:8.1f} ms/batch "
          f"({t_warm*1e3/args.batch:.1f} ms/img)")

    # --- 2. H2D upload, blocked (no compute in flight)
    mesh = _mesh_from_cfg(cfg, args.batch)
    with jax.sharding.set_mesh(mesh):
        batch = last
        nbytes = sum(np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(batch))
        g = shard_batch(mesh, batch)  # once for allocation warmup
        jax.block_until_ready(g.pixels)
        t0 = time.time()
        for _ in range(n):
            g = shard_batch(mesh, batch)
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

        # --- 4. the real loop (prefetch + put + dispatch), as the CLI runs,
        # with per-phase attribution: wait-on-prefetch / shard_batch /
        # normalize+step dispatch (all non-blocking dispatch; the device
        # backpressures through donation)
        it = loader.prefetched(max_batches=n + 2)
        b0 = next(it)  # spin up prefetch thread
        g = shard_batch(mesh, b0)
        state, m = train_step(state, g._replace(pixels=norm(g.pixels)))
        t0 = time.time()
        k = 0
        t_next = t_put = t_disp = 0.0
        while True:
            ta = time.time()
            try:
                b = next(it)
            except StopIteration:
                break
            tb = time.time()
            g = shard_batch(mesh, b)
            tc = time.time()
            state, m = train_step(state, g._replace(pixels=norm(g.pixels)))
            td = time.time()
            t_next += tb - ta
            t_put += tc - tb
            t_disp += td - tc
            k += 1
            if k % 10 == 0:
                print(f"    iter {k}: next {1e3*(tb-ta):.1f} put "
                      f"{1e3*(tc-tb):.1f} disp {1e3*(td-tc):.1f} ms")
        td0 = time.time()
        jax.block_until_ready(m["loss"])
        t_drain = time.time() - td0
        t_loop = (time.time() - t0) / max(k, 1)
        k = max(k, 1)
        print(f"  final drain   : {t_drain*1e3:8.1f} ms "
              f"({t_drain*1e3/k:.1f} ms/iter amortized)")
        print(f"full loop       : {t_loop*1e3:8.1f} ms/iter "
              f"(overlap efficiency: "
              f"{(t_warm + t_h2d + t_dev)/max(t_loop,1e-9):.2f}x vs serial)")
        print(f"  wait prefetch : {t_next/k*1e3:8.1f} ms/iter")
        print(f"  shard_batch   : {t_put/k*1e3:8.1f} ms/iter")
        print(f"  step dispatch : {t_disp/k*1e3:8.1f} ms/iter "
              f"(incl. device backpressure)")

        # --- 5. the same loop with PER-ITERATION sync.  Through a remote
        # transport, a deep async queue of interleaved H2D + execute can
        # degrade far below the sum of its parts (the drain above); a
        # blocking loop bounds the queue at one step.
        it = loader.prefetched(max_batches=n + 2)
        b0 = next(it)
        g = shard_batch(mesh, b0)
        state, m = train_step(state, g._replace(pixels=norm(g.pixels)))
        jax.block_until_ready(m["loss"])
        t0 = time.time()
        k = 0
        for b in it:
            g = shard_batch(mesh, b)
            state, m = train_step(state, g._replace(pixels=norm(g.pixels)))
            jax.block_until_ready(m["loss"])
            k += 1
        t_sync = (time.time() - t0) / max(k, 1)
        print(f"sync loop       : {t_sync*1e3:8.1f} ms/iter "
              f"(block_until_ready every step)")

        # --- 6. the banked loop: device-resident canvas cache
        # (TPU.DEVICE_CANVAS_CACHE_MB) — steady state ships only metadata
        from abr_iod_tpu.engine.driver import _make_pixel_bank

        px_bank = _make_pixel_bank(cfg, mesh, source)
        if px_bank is None:
            print("banked loop     : disabled "
                  "(TPU.DEVICE_CANVAS_CACHE_MB=0 or multi-process)")
            return
        bloader = DetectionLoader(source, cfg, batch_size=args.batch,
                                  is_train=True, seed=int(cfg.SEED),
                                  normalize="device", pixel_bank=px_bank)
        # warm epoch: fill the bank (miss uploads), then time steady state
        for item in bloader.prefetched(max_batches=n):
            bb, keys, cv = item
            jax.block_until_ready(px_bank.batch(keys, cv))
        it = bloader.prefetched(max_batches=n + 2)
        bb, keys, cv = next(it)
        g = shard_batch(mesh, bb)
        g = g._replace(pixels=norm(px_bank.batch(keys, cv)))
        state, m = train_step(state, g)
        jax.block_until_ready(m["loss"])
        t0 = time.time()
        k = 0
        for bb, keys, cv in it:
            g = shard_batch(mesh, bb)
            g = g._replace(pixels=norm(px_bank.batch(keys, cv)))
            state, m = train_step(state, g)
            jax.block_until_ready(m["loss"])
            k += 1
        t_bank = (time.time() - t0) / max(k, 1)
        s = px_bank.stats()
        print(f"banked loop     : {t_bank*1e3:8.1f} ms/iter "
              f"(hit rate {s['hit_rate']:.2f}, "
              f"{sum(s['entries'].values())} canvases banked)")


if __name__ == "__main__":
    main()
