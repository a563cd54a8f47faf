"""put_like / _put_host: committing host trees onto global shardings.

Reference analogue: torch DDP's initial parameter broadcast + the
checkpointer's load-then-cuda move (maskrcnn_benchmark/utils/checkpoint.py)
— here replaced by collective-free construction from value-identical host
trees (abr_iod_tpu/parallel/mesh.py:_put_host).  The world>1 branch is
exercised for real by __graft_entry__.dryrun_multichip's 2-process
certificate; these tests pin the semantics both branches must share.
"""

import numpy as np
import jax
import jax.numpy as jnp

from abr_iod_tpu.parallel import mesh as mesh_mod
from abr_iod_tpu.parallel.mesh import (
    make_mesh, param_shardings, put_like, shard_params)


def _tree():
    rng = np.random.RandomState(0)
    return {
        "res5": {"conv": {"kernel": rng.randn(1, 1, 8, 16).astype(np.float32)}},
        "rpn": {"bias": rng.randn(12).astype(np.float32)},
    }


def test_shard_params_values_and_shardings():
    mesh = make_mesh(4, 2, devices=jax.devices()[:8])
    tree = _tree()
    sharded = shard_params(mesh, tree)
    want = param_shardings(mesh, tree)
    for (ka, a), (kw, w), (kh, h) in zip(
        jax.tree_util.tree_leaves_with_path(sharded),
        jax.tree_util.tree_leaves_with_path(want),
        jax.tree_util.tree_leaves_with_path(tree),
    ):
        assert a.sharding == w, (ka, a.sharding, w)
        np.testing.assert_array_equal(np.asarray(a), h)
    # the TP kernel actually shards over 'model'
    k = sharded["res5"]["conv"]["kernel"]
    assert k.sharding.spec[-1] == "model"


def test_put_like_matches_reference_shardings():
    mesh = make_mesh(4, 2, devices=jax.devices()[:8])
    ref = shard_params(mesh, _tree())
    rng = np.random.RandomState(1)
    host = jax.tree_util.tree_map(
        lambda x: rng.randn(*x.shape).astype(np.float32), ref)
    out = put_like(host, ref)
    for o, r, h in zip(
        jax.tree_util.tree_leaves(out),
        jax.tree_util.tree_leaves(ref),
        jax.tree_util.tree_leaves(host),
    ):
        assert o.sharding == r.sharding
        np.testing.assert_array_equal(np.asarray(o), h)


def test_put_host_multiprocess_branch_equivalent(monkeypatch):
    """The world>1 make_array_from_callback branch must build the same
    global array as device_put does (exercised here on one process by
    forcing the branch; the real 2-process run is the dryrun's job)."""
    mesh = make_mesh(4, 2, devices=jax.devices()[:8])
    tree = _tree()
    want = shard_params(mesh, tree)  # device_put branch
    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
    got = shard_params(mesh, tree)  # make_array_from_callback branch
    monkeypatch.undo()
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        assert g.sharding == w.sharding
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # and it must round-trip through a jit matmul identically
    f = jax.jit(lambda t: jnp.einsum(
        "hwio,o->hwi", t["res5"]["conv"]["kernel"],
        jnp.arange(16, dtype=jnp.float32)))
    np.testing.assert_allclose(
        np.asarray(f(got)), np.asarray(f(want)), rtol=1e-6)
