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


def test_async_checkpointer_matches_sync(tmp_path):
    """async_saves=True must produce byte-identical files, honor ordering
    (last save of a name wins), and flush on wait()/load()."""
    rng = np.random.default_rng(0)
    tree = {"params": {"w": rng.normal(size=(64, 64)).astype(np.float32)},
            "opt_state": {"mu": rng.normal(size=(64,)).astype(np.float32)},
            "iteration": 3}

    sync_ck = Checkpointer(str(tmp_path / "sync"))
    async_ck = Checkpointer(str(tmp_path / "async"), async_saves=True)
    sync_ck.save("model_last", tree)
    # two queued saves of the same name: the worker runs FIFO, last wins
    stale = dict(tree, iteration=1)
    async_ck.save("model_last", stale)
    async_ck.save("model_last", tree)
    async_ck.wait()

    a = (tmp_path / "async" / "model_last.msgpack").read_bytes()
    s = (tmp_path / "sync" / "model_last.msgpack").read_bytes()
    assert a == s
    assert async_ck.last_checkpoint_path().endswith("model_last.msgpack")
    restored = async_ck.load()
    assert int(restored["iteration"]) == 3
    # no leftover tmp files from the atomic writes
    assert not list((tmp_path / "async").glob("*.tmp"))


def test_async_checkpointer_surfaces_io_errors(tmp_path, monkeypatch):
    """A failed background write must raise on wait(), and the
    last_checkpoint pointer must keep targeting the previous intact file
    (pointer is only updated after the data file is fully on disk)."""
    import pytest

    ck = Checkpointer(str(tmp_path), async_saves=True)
    tree = {"params": {"w": np.ones((4,), np.float32)}, "iteration": 7}
    good_path = ck.save("model_last", tree)
    ck.wait()

    def boom(path, data):
        raise OSError("disk full")

    monkeypatch.setattr(Checkpointer, "_atomic_write", staticmethod(boom))
    ck.save("model_last", dict(tree, iteration=99))
    with pytest.raises(OSError, match="disk full"):
        ck.wait()
    monkeypatch.undo()
    assert ck.last_checkpoint_path() == good_path
    assert int(ck.load()["iteration"]) == 7


def test_atomic_write_replaces_not_truncates(tmp_path):
    """An interrupted save never corrupts the existing checkpoint: data
    goes to <path>.tmp first and only an os.replace publishes it."""
    ck = Checkpointer(str(tmp_path))
    p = ck.save("model_last", {"params": {"w": np.ones((4,), np.float32)},
                               "iteration": 1})
    before = open(p, "rb").read()
    # simulate a crash between tmp-write and replace: a stray tmp file
    with open(p + ".tmp", "wb") as f:
        f.write(b"half-written garbage")
    assert open(p, "rb").read() == before  # target untouched
    assert int(ck.load()["iteration"]) == 1  # resume path still intact
