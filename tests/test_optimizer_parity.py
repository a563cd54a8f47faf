"""Multi-step optimizer + LR-schedule parity vs torch SGD.

The one-step train parity test (test_train_parity.py) pins the first SGD
update, where the momentum buffer is freshly initialized.  This test pins
the seams that only appear across MULTIPLE steps: momentum accumulation
(buf = m*buf + grad), the lr-applied-after-momentum semantics when the
LR changes mid-run, the linear warmup ramp, and a milestone decay landing
on a live momentum buffer.

Reference conventions reproduced exactly:
  * solver/build.py:7-26 — per-param groups: biases lr*BIAS_LR_FACTOR and
    WEIGHT_DECAY_BIAS, everything else base lr + WEIGHT_DECAY.
  * solver/lr_scheduler.py:39-52 — lr(k) = base * wf(k) * gamma**
    bisect_right(milestones, k), wf(k) = warmup_factor*(1-a)+a with
    a = k/warmup_iters while k < warmup_iters.
  * engine/trainer.py:95-96 — optimizer.step() THEN scheduler.step(),
    with the _LRScheduler constructor having already stepped last_epoch
    to 0: update k (0-based) is applied at lr(k) — the same 0-based
    count optax's schedule sees.
  * torch.optim.SGD momentum: d = g + wd*p; buf = m*buf + d;
    p -= lr * buf — the CURRENT lr scales the whole buffer.
"""

from bisect import bisect_right

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import optax

from abr_iod_tpu.config import get_default_config
from abr_iod_tpu.solver.optim import make_optimizer, warmup_multistep_schedule

BASE_LR, MOMENTUM, WD, BIAS_LR, WD_BIAS = 0.02, 0.9, 1e-4, 2.0, 0.0
WARMUP_ITERS, WARMUP_FACTOR = 3, 1.0 / 3
MILESTONES, GAMMA = (5,), 0.1
N_STEPS = 8  # covers warmup (0-2), flat (3-4), and the milestone drop (5+)


def _cfg():
    cfg = get_default_config()
    cfg.SOLVER.BASE_LR = BASE_LR
    cfg.SOLVER.MOMENTUM = MOMENTUM
    cfg.SOLVER.WEIGHT_DECAY = WD
    cfg.SOLVER.BIAS_LR_FACTOR = BIAS_LR
    cfg.SOLVER.WEIGHT_DECAY_BIAS = WD_BIAS
    cfg.SOLVER.WARMUP_ITERS = WARMUP_ITERS
    cfg.SOLVER.WARMUP_FACTOR = WARMUP_FACTOR
    cfg.SOLVER.STEPS = MILESTONES
    cfg.SOLVER.GAMMA = GAMMA
    cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 2  # stem + layer1 frozen
    return cfg


def _reference_lr_factor(k):
    """solver/lr_scheduler.py:39-52 get_lr, re-stated."""
    wf = 1.0
    if k < WARMUP_ITERS:
        a = float(k) / WARMUP_ITERS
        wf = WARMUP_FACTOR * (1 - a) + a
    return wf * GAMMA ** bisect_right(list(MILESTONES), k)


def _tree(rng):
    """Synthetic param tree whose paths exercise every label class:
    frozen (stem/layer1 under FREEZE_CONV_BODY_AT=2), bias, weight."""
    leaf = lambda *s: rng.randn(*s).astype(np.float32)
    return {
        "params": {
            "backbone": {
                "stem": {"conv": {"kernel": leaf(3, 3, 4, 8)}},
                "layer1": {"0": {"conv1": {"kernel": leaf(1, 1, 8, 8)}}},
                "layer2": {"0": {"conv1": {"kernel": leaf(1, 1, 8, 16),
                                           "bias": leaf(16)}}},
            },
            "rpn": {"conv": {"kernel": leaf(3, 3, 16, 16), "bias": leaf(16)}},
            "roi_heads": {"cls_score": {"kernel": leaf(16, 5),
                                        "bias": leaf(5)}},
        }
    }


def _grads_at(params, k):
    """Deterministic, step-varying gradients (identical on both sides)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    out = []
    for i, leaf in enumerate(leaves):
        rng = np.random.RandomState(1000 * k + i)
        out.append(rng.randn(*np.shape(leaf)).astype(np.float32)
                   * np.float32(1.0 + 0.25 * np.cos(0.7 * k + i)))
    return jax.tree_util.tree_unflatten(treedef, out)


def test_schedule_matches_reference_formula():
    sched = warmup_multistep_schedule(_cfg().SOLVER)
    for k in range(10):
        np.testing.assert_allclose(
            float(sched(k)), _reference_lr_factor(k), rtol=1e-6, err_msg=f"step {k}")


def test_multistep_sgd_trajectory_matches_torch():
    cfg = _cfg()
    rng = np.random.RandomState(0)
    params0 = _tree(rng)

    # ---- our side: optax chain from make_optimizer, N_STEPS updates
    tx = make_optimizer(cfg, params0)
    params = jax.tree_util.tree_map(np.asarray, params0)
    opt_state = tx.init(params)
    ours_traj = []
    for k in range(N_STEPS):
        updates, opt_state = tx.update(_grads_at(params0, k), opt_state, params)
        params = optax.apply_updates(params, updates)
        ours_traj.append(jax.tree_util.tree_map(np.asarray, params))

    # ---- torch side: reference param groups + SGD + re-stated scheduler
    flat0 = jax.tree_util.tree_flatten_with_path(params0)[0]
    tensors, groups = {}, {"weight": [], "bias": [], "frozen": []}
    for path, leaf in flat0:
        names = [str(getattr(p, "key", p)) for p in path]
        t = torch.nn.Parameter(torch.from_numpy(np.array(leaf)))
        tensors[tuple(names)] = t
        if "stem" in names or "layer1" in names:
            groups["frozen"].append(t)
        elif names[-1] == "bias":
            groups["bias"].append(t)
        else:
            groups["weight"].append(t)
    assert groups["frozen"] and groups["bias"] and groups["weight"]
    opt = torch.optim.SGD(
        [
            {"params": groups["weight"], "lr": BASE_LR, "weight_decay": WD},
            {"params": groups["bias"], "lr": BASE_LR * BIAS_LR,
             "weight_decay": WD_BIAS},
        ],
        lr=BASE_LR, momentum=MOMENTUM,
    )
    base_lrs = [g["lr"] for g in opt.param_groups]
    torch_traj = []
    for k in range(N_STEPS):
        factor = _reference_lr_factor(k)
        for g, base in zip(opt.param_groups, base_lrs):
            g["lr"] = base * factor
        grads = _grads_at(params0, k)
        flat_g = jax.tree_util.tree_flatten_with_path(grads)[0]
        opt.zero_grad()
        for path, gleaf in flat_g:
            names = tuple(str(getattr(p, "key", p)) for p in path)
            t = tensors[names]
            if t in set(groups["frozen"]):
                continue
            t.grad = torch.from_numpy(np.array(gleaf))
        opt.step()
        torch_traj.append({n: t.detach().numpy().copy()
                           for n, t in tensors.items()})

    # ---- compare every leaf at every step
    for k in range(N_STEPS):
        flat_ours = jax.tree_util.tree_flatten_with_path(ours_traj[k])[0]
        for path, leaf in flat_ours:
            names = tuple(str(getattr(p, "key", p)) for p in path)
            if "stem" in names or "layer1" in names:
                # frozen: bit-identical to the initial values on our side
                np.testing.assert_array_equal(
                    np.asarray(leaf), tensors[names].detach().numpy(),
                    err_msg=f"step {k} {names}")
                continue
            np.testing.assert_allclose(
                np.asarray(leaf), torch_traj[k][names],
                rtol=2e-5, atol=1e-7, err_msg=f"step {k} {names}")
