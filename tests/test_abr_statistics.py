"""Statistical equivalence of the on-device ABR fusion
(SURVEY.md §7 hard part 4): the jit implementation must reproduce the
reference's *distribution* — mode mix 2:1:1 untouched:mixup:mosaic
(voc_abr.py:832-839), λ ~ Beta(2,5), ≤2 crops per mixup — without its
sequential retry loops."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from abr_iod_tpu.data.abr_fusion import CropBank, abr_fuse_batch


def _bank(rng, n=32):
    hw = (32, 32)
    return CropBank(
        pixels=jnp.asarray(rng.uniform(50, 200, (n, *hw, 3)).astype(np.float32)),
        content_hw=jnp.asarray(np.tile(np.array(hw, np.float32), (n, 1))),
        orig_hw=jnp.asarray(rng.uniform(80, 200, (n, 2)).astype(np.float32)),
        labels=jnp.asarray(rng.randint(1, 4, n).astype(np.int32)),
    )


@pytest.mark.slow
def test_mode_frequencies(rng):
    b, h, w, m = 64, 64, 96, 10
    pixels = jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32))
    sizes = jnp.tile(jnp.array([[h, w]], jnp.int32), (b, 1))
    orig = jnp.tile(jnp.array([[200, 260]], jnp.int32), (b, 1))
    boxes = jnp.zeros((b, m, 4)).at[:, 0].set(jnp.array([2.0, 2.0, 25.0, 25.0]))
    labels = jnp.zeros((b, m), jnp.int32).at[:, 0].set(5)
    mask = jnp.zeros((b, m), bool).at[:, 0].set(True)
    bank = _bank(rng)

    untouched = mixup = mosaic = 0
    trials = 6
    for t in range(trials):
        px, sz, bx, lb, mk = map(
            np.asarray,
            abr_fuse_batch(pixels, sizes, orig, boxes, labels, mask, bank,
                           jax.random.PRNGKey(t), 64),
        )
        for i in range(b):
            if np.allclose(px[i], np.asarray(pixels)[i]):
                untouched += 1
            elif np.allclose(sz[i], [64, 64]):
                mosaic += 1
            else:
                mixup += 1
    total = trials * b
    # expectation: 1/2 untouched, 1/4 each (binomial σ ≈ 0.025 at n=384)
    assert abs(untouched / total - 0.5) < 0.08, untouched / total
    assert abs(mosaic / total - 0.25) < 0.08, mosaic / total
    assert abs(mixup / total - 0.25) < 0.08, mixup / total


@pytest.mark.slow  # compile-heavy (fast-tier budget)
def test_mixup_adds_at_most_two_crops(rng):
    b, h, w, m = 48, 64, 96, 10
    pixels = jnp.zeros((b, h, w, 3))
    sizes = jnp.tile(jnp.array([[h, w]], jnp.int32), (b, 1))
    orig = jnp.tile(jnp.array([[120, 150]], jnp.int32), (b, 1))
    boxes = jnp.zeros((b, m, 4)).at[:, 0].set(jnp.array([2.0, 2.0, 20.0, 20.0]))
    labels = jnp.zeros((b, m), jnp.int32).at[:, 0].set(5)
    mask = jnp.zeros((b, m), bool).at[:, 0].set(True)
    bank = _bank(rng)
    px, sz, bx, lb, mk = map(
        np.asarray,
        abr_fuse_batch(pixels, sizes, orig, boxes, labels, mask, bank,
                       jax.random.PRNGKey(9), 64),
    )
    for i in range(b):
        if np.allclose(sz[i], [h, w]):  # untouched or mixup
            n = mk[i].sum()
            assert 1 <= n <= 3  # original + ≤2 pasted crops


@pytest.mark.slow  # compile-heavy (fast-tier budget)
def test_mosaic_boxes_have_bank_labels_and_min_size(rng):
    b, h, w, m = 48, 64, 96, 10
    pixels = jnp.zeros((b, h, w, 3))
    sizes = jnp.tile(jnp.array([[h, w]], jnp.int32), (b, 1))
    orig = jnp.tile(jnp.array([[120, 150]], jnp.int32), (b, 1))
    boxes = jnp.zeros((b, m, 4))
    labels = jnp.full((b, m), 7, jnp.int32)
    mask = jnp.zeros((b, m), bool).at[:, 0].set(True)
    bank = _bank(rng)
    px, sz, bx, lb, mk = map(
        np.asarray,
        abr_fuse_batch(pixels, sizes, orig, boxes, labels, mask, bank,
                       jax.random.PRNGKey(4), 64),
    )
    for i in range(b):
        if np.allclose(sz[i], [64, 64]) and not np.allclose(px[i], 0.0):
            sel = mk[i]
            if sel.any():
                assert set(lb[i][sel].tolist()) <= {1, 2, 3}  # bank classes only
                v = bx[i][sel]
                # reference drops boxes ≤2 px (voc_abr.py:797-801)
                assert ((v[:, 2] - v[:, 0]) > 2.0).all()
                assert ((v[:, 3] - v[:, 1]) > 2.0).all()


def test_crop_index_predraw_mirrors_branch_key_streams():
    """_draw_crop_indices must reproduce EXACTLY the key-split chains the
    mixup/mosaic branches use (data/abr_fusion.py): the pre-gather
    optimization relies on it.  If someone adds/removes a split in
    _mixup_one/_mosaic_one without updating _draw_crop_indices, crop
    choice silently desyncs from (and can correlate with) the
    scale/position draws — this pin makes that edit fail loudly."""
    import jax
    import jax.numpy as jnp
    from abr_iod_tpu.data.abr_fusion import _draw_crop_indices

    n_bank = 77
    for seed in range(5):
        k = jax.random.PRNGKey(seed)
        idx = _draw_crop_indices(k, n_bank)

        # independent re-derivation following the branch code line by line
        _, k_fuse = jax.random.split(k)
        # mixup (_mixup_one): k_lambda, k_rest = split(k_fuse);
        # attempt keys = split(k_rest, 2); per attempt split(k, 3)[0]
        _, k_rest = jax.random.split(k_fuse)
        mix = [
            jax.random.randint(jax.random.split(mk, 3)[0], (), 0, n_bank)
            for mk in jax.random.split(k_rest, 2)
        ]
        # mosaic (_mosaic_one): k_center, k_crops = split(k_fuse);
        # quadrant keys = split(k_crops, 4); per quadrant split(k)[0]
        _, k_crops = jax.random.split(k_fuse)
        mos = [
            jax.random.randint(jax.random.split(mk)[0], (), 0, n_bank)
            for mk in jax.random.split(k_crops, 4)
        ]
        expected = jnp.stack(mix + mos)
        assert (idx == expected).all(), (seed, idx, expected)
