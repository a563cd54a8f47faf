import numpy as np
import jax.numpy as jnp

from abr_iod_tpu.ops.losses import smooth_l1_loss, sigmoid_focal_loss
from tests.oracles import sigmoid_focal_loss_numpy


def test_smooth_l1_hand_values():
    # below beta: 0.5*x^2/beta; above: x - 0.5*beta
    beta = 1.0 / 9
    x = jnp.array([0.05, 0.5, -2.0])
    t = jnp.zeros(3)
    got = np.asarray(smooth_l1_loss(x, t, beta))
    np.testing.assert_allclose(got[0], 0.5 * 0.05**2 / beta, rtol=1e-6)
    np.testing.assert_allclose(got[1], 0.5 - 0.5 * beta, rtol=1e-6)
    np.testing.assert_allclose(got[2], 2.0 - 0.5 * beta, rtol=1e-6)


def test_focal_loss_matches_reference_oracle(rng):
    n, k = 64, 10
    logits = rng.randn(n, k).astype(np.float32) * 2
    targets = rng.randint(-1, k + 1, n).astype(np.int32)
    got = np.asarray(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets), 2.0, 0.25))
    ref = sigmoid_focal_loss_numpy(logits, targets, 2.0, 0.25)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
