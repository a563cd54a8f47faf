"""DCN + GN model variants: the reference's MODEL.RESNETS.STAGE_WITH_DCN /
WITH_MODULATED_DCN / TRANS_FUNC keys must take effect in the built model
(reference resnet.py:92,110-123, layers/misc.py DFConv2d:114-203), not
merely load.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from abr_iod_tpu.config import get_default_config
from abr_iod_tpu.models.build import build_detection_model


def _tiny(cfg):
    cfg.MODEL.RPN.ANCHOR_SIZES = (16, 32, 64)
    cfg.MODEL.RPN.ASPECT_RATIOS = (1.0,)
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 8
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64  # GN needs >=32 channels
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 4
    cfg.TPU.BACKBONE_STAGES = (1, 1, 1)
    cfg.TPU.RES5_BLOCKS = 1
    cfg.TPU.RES5_BOTTLENECK = 32
    cfg.TPU.RES5_OUT = 64
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def _forward(cfg):
    model = build_detection_model(cfg)
    px = jnp.zeros((1, 64, 96, 3))
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0], [8.0, 8.0, 60.0, 50.0]]])
    params = model.init(jax.random.PRNGKey(0), px, rois)
    out = model.apply(params, px, rois)
    return model, params, out


@pytest.mark.slow
def test_stage_with_dcn_builds_offset_convs_and_runs():
    cfg = _tiny(get_default_config())
    cfg.MODEL.RESNETS.STAGE_WITH_DCN = (False, False, True, True)
    _, params, out = _forward(cfg)
    flat = {jax.tree_util.keystr(k) for k, _ in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    # layer3 (stage index 2) and res5 (stage 4) carry offset convs
    assert any("layer3" in k and "offset" in k for k in flat), sorted(flat)[:5]
    assert any("res5" in k and "offset" in k for k in flat)
    assert not any("layer1" in k and "offset" in k for k in flat)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


@pytest.mark.slow  # compile-heavy (fast-tier budget)
def test_modulated_dcn_offset_channels():
    cfg = _tiny(get_default_config())
    cfg.MODEL.RESNETS.STAGE_WITH_DCN = (False, False, True, False)
    cfg.MODEL.RESNETS.WITH_MODULATED_DCN = True
    model = build_detection_model(cfg)
    px = jnp.zeros((1, 64, 96, 3))
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]])
    params = model.init(jax.random.PRNGKey(0), px, rois)
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    off = [v for k, v in leaves
           if "offset" in jax.tree_util.keystr(k)
           and jax.tree_util.keystr(k).endswith("kernel']")]
    # v2: 3 channels per tap (dy, dx, mask) vs v1's 2 (DFConv2d:143-149)
    assert off and all(o.shape[-1] == 27 for o in off), [o.shape for o in off]


@pytest.mark.slow
def test_dcn_gradients_flow_to_offsets():
    cfg = _tiny(get_default_config())
    cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 0  # nothing frozen
    cfg.MODEL.RESNETS.STAGE_WITH_DCN = (False, False, True, False)
    model = build_detection_model(cfg)
    px = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 96, 3))
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]])
    params = model.init(jax.random.PRNGKey(0), px, rois)
    # fresh init zeroes every bn3 scale (residual-branch guard), which
    # kills gradients through conv2 at init — emulate loaded weights
    rng = np.random.RandomState(0)
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.abs(rng.normal(0.5, 0.2, a.shape)) + 0.1, a.dtype)
        if a.ndim == 1 and a.shape[0] > 1 else a,
        params,
    )

    def loss(p):
        feats, _ = model.apply(p, px, method="backbone")
        return jnp.sum(feats.astype(jnp.float32) ** 2)

    grads = jax.grad(loss)(params)
    got = [np.abs(np.asarray(v)).max() for k, v in
           jax.tree_util.tree_flatten_with_path(grads)[0]
           if "offset" in jax.tree_util.keystr(k)]
    assert got and max(got) > 0.0


@pytest.mark.slow  # compile-heavy (fast-tier budget)
def test_gn_trans_func_variant():
    cfg = _tiny(get_default_config())
    cfg.MODEL.RESNETS.TRANS_FUNC = "BottleneckWithGN"
    _, params, out = _forward(cfg)
    flat = {jax.tree_util.keystr(k) for k, _ in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    assert any("gn1" in k for k in flat)
    assert not any("']['bn1']" in k for k in flat)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


@pytest.mark.slow  # compile-heavy (fast-tier budget)
def test_gn_params_are_trainable_not_frozen():
    """GN scale/bias must land in a trainable optimizer group — the
    frozen-BN mask keys off bn* names (solver/optim.py), and GN modules
    deliberately use gn* names."""
    from abr_iod_tpu.solver.optim import param_labels

    cfg = _tiny(get_default_config())
    cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 0
    cfg.MODEL.RESNETS.TRANS_FUNC = "BottleneckWithGN"
    model = build_detection_model(cfg)
    px = jnp.zeros((1, 64, 96, 3))
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]])
    params = model.init(jax.random.PRNGKey(0), px, rois)
    labels = param_labels(params, cfg.MODEL)
    got = [v for k, v in
           jax.tree_util.tree_flatten_with_path(labels)[0]
           if "gn" in jax.tree_util.keystr(k)]
    assert got and all(l in ("weight", "bias") for l in got), set(got)


def test_unknown_trans_func_rejected():
    import pytest

    cfg = _tiny(get_default_config())
    cfg.MODEL.RESNETS.TRANS_FUNC = "BottleneckWithSomethingElse"
    with pytest.raises(ValueError, match="TRANS_FUNC"):
        build_detection_model(cfg)


@pytest.mark.slow  # compile-heavy (fast-tier budget)
def test_resnext_groups_and_stride_in_1x1_take_effect():
    """MODEL.RESNETS.NUM_GROUPS widens the bottleneck and groups conv2;
    STRIDE_IN_1X1=False moves the stage stride onto the 3x3 conv
    (reference resnet.py:276-278)."""
    cfg = _tiny(get_default_config())
    cfg.MODEL.RESNETS.NUM_GROUPS = 2
    cfg.MODEL.RESNETS.STRIDE_IN_1X1 = False
    model = build_detection_model(cfg)
    px = jnp.zeros((1, 64, 96, 3))
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]])
    params = model.init(jax.random.PRNGKey(0), px, rois)
    leaves = {jax.tree_util.keystr(k): v.shape for k, v in
              jax.tree_util.tree_flatten_with_path(params)[0]}
    # layer2 bottleneck = num_groups * width_per_group * 2 = 32; conv2 is
    # grouped so its kernel carries Cin/groups = 16 input channels
    k2 = [s for p, s in leaves.items()
          if "layer2" in p and "conv2" in p and p.endswith("kernel']")]
    assert k2 and k2[0] == (3, 3, 16, 32), k2
    out = model.apply(params, px, rois)
    # stride still 16 overall; C4 channels = RES2_OUT_CHANNELS * 4
    assert out["features"].shape == (1, 4, 6, 256)


def test_res5_dilation_takes_effect():
    """RES5_DILATION=2 keeps the RoI head at 7x7 (stride reset to 1) with
    dilated 3x3 taps (reference roi_box_feature_extractors.py:36 +
    resnet.py:272-274)."""
    from abr_iod_tpu.models.resnet import Res5Head

    x = jnp.zeros((2, 7, 7, 16))
    h1 = Res5Head(block_count=1, bottleneck_channels=8, out_channels=32)
    h2 = Res5Head(block_count=1, bottleneck_channels=8, out_channels=32,
                  dilation=2)
    p1 = h1.init(jax.random.PRNGKey(0), x)
    p2 = h2.init(jax.random.PRNGKey(0), x)
    assert h1.apply(p1, x).shape == (2, 4, 4, 32)  # stride 2
    assert h2.apply(p2, x).shape == (2, 7, 7, 32)  # dilation resets stride
