import numpy as np
import jax
import jax.numpy as jnp

from abr_iod_tpu.models import matcher as M
from abr_iod_tpu.models import sampler as S
from abr_iod_tpu.structures import boxes as B


def test_matcher_thresholds():
    # quality: 2 gt x 4 preds
    q = jnp.array(
        [
            [0.8, 0.4, 0.2, 0.0],
            [0.1, 0.6, 0.35, 0.0],
        ]
    )
    gt_mask = jnp.array([True, True])
    res = M.match(q, gt_mask, 0.7, 0.3)
    np.testing.assert_array_equal(np.asarray(res.matched_idx), [0, -2, -2, -1])
    res = M.match(q, gt_mask, 0.5, 0.3)
    np.testing.assert_array_equal(np.asarray(res.matched_idx), [0, 1, -2, -1])


def test_matcher_padded_gt_ignored():
    q = jnp.array([[0.9, 0.9], [0.95, 0.99]])
    gt_mask = jnp.array([True, False])
    res = M.match(q, gt_mask, 0.7, 0.3)
    np.testing.assert_array_equal(np.asarray(res.matched_idx), [0, 0])


def test_matcher_low_quality_recovery():
    # pred 2 is gt1's best match (0.25 < low threshold) → recovered
    q = jnp.array([[0.8, 0.1, 0.05], [0.1, 0.05, 0.25]])
    gt_mask = jnp.array([True, True])
    res = M.match(q, gt_mask, 0.7, 0.3, allow_low_quality_matches=True)
    np.testing.assert_array_equal(np.asarray(res.matched_idx), [0, -1, 1])


def test_matcher_empty_gt_all_background():
    q = jnp.zeros((2, 5))
    res = M.match(q, jnp.zeros(2, bool), 0.7, 0.3)
    assert (np.asarray(res.matched_idx) == -1).all()


def test_balanced_masks_counts():
    labels = jnp.array([1] * 10 + [0] * 100 + [-1] * 20, dtype=jnp.int32)
    pos, neg = S.balanced_sample_masks(labels, jax.random.PRNGKey(0), 64, 0.5)
    pos, neg = np.asarray(pos), np.asarray(neg)
    assert pos.sum() == 10  # fewer positives than quota
    assert neg.sum() == 54
    assert not (pos & (np.asarray(labels) != 1)).any()
    assert not (neg & (np.asarray(labels) != 0)).any()


def test_balanced_masks_caps_positives():
    labels = jnp.array([1] * 100 + [0] * 100, dtype=jnp.int32)
    pos, neg = S.balanced_sample_masks(labels, jax.random.PRNGKey(1), 64, 0.25)
    assert int(np.asarray(pos).sum()) == 16
    assert int(np.asarray(neg).sum()) == 48


def test_balanced_indices_fixed_size():
    labels = jnp.array([1] * 5 + [0] * 50 + [-1] * 10, dtype=jnp.int32)
    samp = S.balanced_sample_indices(labels, jax.random.PRNGKey(2), 32, 0.25)
    idx, valid, is_pos = map(np.asarray, samp)
    assert idx.shape == (32,)
    assert valid.sum() == 32  # 5 pos + 27 neg
    assert is_pos.sum() == 5
    labels_np = np.asarray(labels)
    assert (labels_np[idx[is_pos]] == 1).all()
    sel_neg = valid & ~is_pos
    assert (labels_np[idx[sel_neg]] == 0).all()
    # sampled indices are unique among valid slots
    assert len(np.unique(idx[valid])) == valid.sum()


def test_balanced_indices_randomness_differs():
    labels = jnp.array([1] * 50 + [0] * 200, dtype=jnp.int32)
    a = S.balanced_sample_indices(labels, jax.random.PRNGKey(3), 64, 0.25)
    b = S.balanced_sample_indices(labels, jax.random.PRNGKey(4), 64, 0.25)
    assert not np.array_equal(np.asarray(a.idx), np.asarray(b.idx))


def test_take_matched_rows_equals_gather():
    # the one-hot MXU realization must reproduce the native row-gather
    # exactly: realistic payload = [M,5] (box coords up to canvas scale,
    # integer labels), indices at dense-anchor scale
    rng = np.random.RandomState(7)
    table = np.concatenate(
        [rng.uniform(0, 1344, size=(64, 4)).astype(np.float32),
         rng.randint(0, 21, size=(64, 1)).astype(np.float32)], axis=1)
    idx = rng.randint(0, 64, size=20000).astype(np.int32)
    via_dot = np.asarray(
        M.take_matched_rows(jnp.asarray(table), jnp.asarray(idx), backend="onehot"))
    np.testing.assert_array_equal(via_dot, table[idx])
