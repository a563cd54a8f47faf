import numpy as np
import jax
import jax.numpy as jnp

from abr_iod_tpu.structures.masks import (
    polygons_to_mask,
    crop_and_resize_masks,
    paste_masks_in_image,
)
from abr_iod_tpu.models.mask_head import (
    MaskRCNNFPNFeatureExtractor,
    MaskRCNNC4Predictor,
    mask_rcnn_loss,
)


def test_polygon_rasterization():
    m = polygons_to_mask([[2, 2, 10, 2, 10, 10, 2, 10]], 16, 16)
    assert m[5, 5] and not m[14, 14]
    assert m.sum() >= 64


def test_crop_and_resize_identity_box():
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    out = np.asarray(
        crop_and_resize_masks(jnp.asarray(mask[None]), jnp.asarray([[8.0, 8.0, 24.0, 24.0]]), 8)
    )[0]
    assert out.shape == (8, 8)
    # center of the box is fully inside the mask
    assert out[3:5, 3:5].min() > 0.9


def test_paste_masks_roundtrip():
    probs = np.ones((1, 8, 8), np.float32)
    boxes = np.array([[10.0, 12.0, 30.0, 28.0]])
    out = paste_masks_in_image(probs, boxes, (48, 48))
    assert out.shape == (1, 48, 48)
    assert out[0, 20, 20]
    assert not out[0, 0, 0]
    assert not out[0, 40, 40]


def test_mask_head_modules_and_loss(rng):
    n, p, c = 4, 7, 5
    pooled = jnp.asarray(rng.randn(n, p, p, 8).astype(np.float32))
    ext = MaskRCNNFPNFeatureExtractor(layers=(8, 8))
    params = ext.init(jax.random.PRNGKey(0), pooled)
    feats = ext.apply(params, pooled)
    pred = MaskRCNNC4Predictor(num_classes=c, dim_reduced=8)
    pp = pred.init(jax.random.PRNGKey(1), feats)
    logits = pred.apply(pp, feats)
    assert logits.shape == (n, 2 * p, 2 * p, c)

    rois = jnp.asarray(
        np.array([[4, 4, 20, 20], [0, 0, 30, 30], [5, 5, 25, 25], [2, 2, 10, 10]],
                 np.float32)
    )
    labels = jnp.array([1, 2, 0, 3], jnp.int32)
    is_pos = jnp.array([True, True, False, True])
    gt_masks = jnp.asarray((rng.rand(n, 32, 32) > 0.5).astype(np.float32))
    loss = mask_rcnn_loss(logits, rois, labels, is_pos, gt_masks)
    assert np.isfinite(float(loss)) and float(loss) > 0

    # no positives → zero loss
    loss0 = mask_rcnn_loss(logits, rois, labels, jnp.zeros(4, bool), gt_masks)
    assert float(loss0) == 0.0
