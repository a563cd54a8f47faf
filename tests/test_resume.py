"""Checkpoint/resume: optimizer state + iteration survive restarts."""

import numpy as np
import jax
import jax.numpy as jnp

from abr_iod_tpu.engine.driver import _restore_or_init_state
from abr_iod_tpu.engine import TrainState
from abr_iod_tpu.solver.optim import make_optimizer
from abr_iod_tpu.utils.checkpoint import Checkpointer

from tests.test_train_step import tiny_model, tiny_cfg, CANVAS


def test_restore_roundtrip(tmp_path):
    cfg = tiny_cfg()
    model = tiny_model()
    pixels = jnp.zeros((1, *CANVAS, 3))
    rois = jnp.zeros((1, 2, 4)) + jnp.asarray([0.0, 0.0, 20.0, 20.0])
    params = model.init(jax.random.PRNGKey(0), pixels, rois)
    tx = make_optimizer(cfg, params)

    ck = Checkpointer(str(tmp_path))
    # fresh: no checkpoint
    state, start = _restore_or_init_state(ck, tx, params, None)
    assert start == 0

    # mutate and save a resumable checkpoint
    mutated = jax.tree_util.tree_map(lambda x: x + 1.0, params)
    ck.save("model_last", {
        "params": jax.device_get(mutated),
        "opt_state": jax.device_get(state.opt_state),
        "iteration": 57,
    })
    state2, start2 = _restore_or_init_state(ck, tx, params, None)
    assert start2 == 57
    np.testing.assert_allclose(
        np.asarray(state2.params["params"]["rpn"]["conv"]["bias"]),
        np.asarray(params["params"]["rpn"]["conv"]["bias"]) + 1.0,
    )


def test_restore_falls_back_on_trimmed(tmp_path):
    cfg = tiny_cfg()
    model = tiny_model()
    pixels = jnp.zeros((1, *CANVAS, 3))
    rois = jnp.zeros((1, 2, 4)) + jnp.asarray([0.0, 0.0, 20.0, 20.0])
    params = model.init(jax.random.PRNGKey(0), pixels, rois)
    tx = make_optimizer(cfg, params)
    ck = Checkpointer(str(tmp_path))
    ck.save("model_trimmed", {"params": jax.device_get(params)}, trim=True)
    state, start = _restore_or_init_state(ck, tx, params, None)
    assert start == 0  # trimmed checkpoint has no optimizer state
