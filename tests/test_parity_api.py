"""API-surface parity smoke tests for the factory/facade modules."""

import numpy as np

from abr_iod_tpu import layers
from abr_iod_tpu.data.samplers import (
    distributed_shard_indices,
    iteration_based_stream,
)
from abr_iod_tpu.structures.keypoints import flip_inds, hflip_keypoints
from abr_iod_tpu.utils.registry import Registry


def test_layers_facade():
    for name in ("nms", "roi_align", "roi_pool", "smooth_l1_loss",
                 "sigmoid_focal_loss", "deform_conv2d", "FrozenBatchNorm"):
        assert hasattr(layers, name)


def test_registry():
    r = Registry()

    @r.register("foo")
    def foo():
        return 1

    r.register("bar", lambda: 2)
    assert r["foo"]() == 1 and r["bar"]() == 2


def test_distributed_shard_indices_cover_all():
    parts = [distributed_shard_indices(10, i, 4, seed=1) for i in range(4)]
    allidx = np.concatenate(parts)
    assert len(allidx) == 12  # padded to divisible like the reference
    assert set(allidx.tolist()) == set(range(10))


def test_iteration_stream_counts_and_resume():
    batches = list(iteration_based_stream(7, max_iterations=5, batch_size=3, seed=0))
    assert len(batches) == 5
    assert all(len(b) == 3 for b in batches)
    resumed = list(iteration_based_stream(7, max_iterations=5, batch_size=3,
                                          seed=0, start_iter=3))
    np.testing.assert_array_equal(resumed[0], batches[3])


def test_keypoint_flip():
    inds = flip_inds()
    assert inds[1] == 2 and inds[2] == 1  # eyes swap
    kps = np.zeros((1, 17, 3))
    kps[0, 1] = [10, 5, 1]  # left_eye
    out = hflip_keypoints(kps, width=100)
    assert out[0, 2, 0] == 89  # appears as right_eye, mirrored


def test_make_layers_factories():
    import jax
    import jax.numpy as jnp

    from abr_iod_tpu.models.make_layers import group_norm, make_conv3x3, make_fc

    x = jnp.ones((1, 8, 8, 4))
    conv = make_conv3x3(64, use_gn=True, use_relu=True)  # 64 % 32 groups == 0
    params = conv.init(jax.random.PRNGKey(0), x)
    y = conv.apply(params, x)
    assert y.shape == (1, 8, 8, 64)
    assert (np.asarray(y) >= 0).all()  # relu applied

    fc = make_fc(5)
    p2 = fc.init(jax.random.PRNGKey(0), jnp.ones((2, 3)))
    assert fc.apply(p2, jnp.ones((2, 3))).shape == (2, 5)

    gn = group_norm(num_groups=2)
    p3 = gn.init(jax.random.PRNGKey(0), x)
    assert gn.apply(p3, x).shape == x.shape


def test_reduce_loss_dict_alias():
    from abr_iod_tpu.utils.comm import reduce_loss_dict

    assert reduce_loss_dict({"a": 1.0}) == {"a": 1.0}
