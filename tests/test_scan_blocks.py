"""Scanned residual stages produce identical outputs to the unrolled
stage when fed the same weights (stacked)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from abr_iod_tpu.models.resnet import Stage


def _stack_blocks(unrolled_params, n_rest):
    """Repack block1..blockN params into the scanned block_rest layout."""
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[unrolled_params[f"block{i}"] for i in range(1, n_rest + 1)],
    )
    return {
        "block0": unrolled_params["block0"],
        "block_rest": {"block": stacked},
    }


def test_scan_stage_matches_unrolled(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    plain = Stage(block_count=4, bottleneck_channels=8, out_channels=16,
                  first_stride=1)
    scan = Stage(block_count=4, bottleneck_channels=8, out_channels=16,
                 first_stride=1, scan_blocks=True)
    p_plain = plain.init(jax.random.PRNGKey(0), x)["params"]
    # make FrozenBN non-trivial so the check is meaningful
    p_plain = jax.tree_util.tree_map(
        lambda a: a + 0.05 * np.random.RandomState(0).randn(*a.shape).astype(a.dtype),
        p_plain,
    )
    y_plain = plain.apply({"params": p_plain}, x)

    p_scan = _stack_blocks(p_plain, 3)
    y_scan = scan.apply({"params": p_scan}, x)
    np.testing.assert_allclose(np.asarray(y_plain), np.asarray(y_scan),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_scan_model_trains(rng):
    from abr_iod_tpu.models import FasterRCNN

    model = FasterRCNN(
        num_classes=4, num_anchors=3, backbone_stages=(3, 3, 3),
        width_per_group=8, res2_out_channels=16, res5_blocks=1,
        res5_bottleneck=16, res5_out=32, scan_blocks=True,
    )
    pixels = jnp.zeros((1, 64, 96, 3))
    rois = jnp.array([[[4.0, 4.0, 40.0, 40.0]]])
    params = model.init(jax.random.PRNGKey(0), pixels, rois)
    out = model.apply(params, pixels, rois)
    assert np.isfinite(np.asarray(out["cls_logits"])).all()
    # scanned stages have stacked params
    l1 = params["params"]["backbone"]["layer1"]
    assert "block_rest" in l1
    assert l1["block_rest"]["block"]["conv1"]["kernel"].shape[0] == 2


@pytest.mark.slow  # compile-heavy (fast-tier budget)
def test_align_restacks_unrolled_checkpoint_into_scan_model(rng):
    from abr_iod_tpu.models import FasterRCNN
    from abr_iod_tpu.utils.checkpoint import align_and_update_params

    kw = dict(num_classes=4, num_anchors=3, backbone_stages=(3, 3, 3),
              width_per_group=8, res2_out_channels=16, res5_blocks=1,
              res5_bottleneck=16, res5_out=32)
    plain = FasterRCNN(**kw)
    scanned = FasterRCNN(**kw, scan_blocks=True)
    pixels = jnp.zeros((1, 64, 96, 3))
    rois = jnp.array([[[4.0, 4.0, 40.0, 40.0]]])
    p_plain = plain.init(jax.random.PRNGKey(1), pixels, rois)
    p_scan = scanned.init(jax.random.PRNGKey(2), pixels, rois)

    merged = align_and_update_params(p_scan, p_plain)
    got = np.asarray(
        merged["params"]["backbone"]["layer1"]["block_rest"]["block"]["conv1"]["kernel"]
    )
    expect = np.stack([
        np.asarray(p_plain["params"]["backbone"]["layer1"][f"block{i}"]["conv1"]["kernel"])
        for i in (1, 2)
    ])
    np.testing.assert_array_equal(got, expect)
    # outputs of the two models now agree
    out_a = plain.apply(p_plain, pixels, rois)
    out_b = scanned.apply(merged, pixels, rois)
    np.testing.assert_allclose(
        np.asarray(out_a["cls_logits"]), np.asarray(out_b["cls_logits"]),
        rtol=2e-5, atol=2e-5,
    )
