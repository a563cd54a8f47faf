import numpy as np
import jax
import jax.numpy as jnp

from abr_iod_tpu.models.fbnet import FBNetTrunk, IRFBlock, ARCH_DEFS


def test_irf_block_residual(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    blk = IRFBlock(expansion=4, out_channels=16)
    variables = blk.init(jax.random.PRNGKey(0), x)
    y = blk.apply(variables, x)
    assert y.shape == x.shape


def test_irf_block_stride(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    blk = IRFBlock(expansion=4, out_channels=24, stride=2, kernel=5)
    variables = blk.init(jax.random.PRNGKey(0), x)
    y = blk.apply(variables, x)
    assert y.shape == (1, 4, 4, 24)


def test_fbnet_trunk_archs(rng):
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    for arch in ARCH_DEFS:
        trunk = FBNetTrunk(arch=arch)
        variables = trunk.init(jax.random.PRNGKey(0), x)
        out, stages = trunk.apply(variables, x)
        assert out.shape[-1] == ARCH_DEFS[arch][-1][1]
        assert len(stages) == len(ARCH_DEFS[arch])
        assert np.isfinite(np.asarray(out)).all()
