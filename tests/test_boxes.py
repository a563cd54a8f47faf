import numpy as np
import jax.numpy as jnp

from abr_iod_tpu.structures import boxes as B


def test_area_plus_one_convention():
    b = jnp.array([[0.0, 0.0, 9.0, 9.0]])
    assert float(B.box_area(b)[0]) == 100.0


def test_iou_identity_and_disjoint():
    a = jnp.array([[0.0, 0.0, 9.0, 9.0], [100.0, 100.0, 109.0, 109.0]])
    iou = B.box_iou(a, a)
    np.testing.assert_allclose(np.diag(np.asarray(iou)), [1.0, 1.0])
    assert float(iou[0, 1]) == 0.0


def test_iou_hand_value():
    # 10x10 boxes offset by 5 in x: inter 5*10=50, union 200-50=150
    a = jnp.array([[0.0, 0.0, 9.0, 9.0]])
    b = jnp.array([[5.0, 0.0, 14.0, 9.0]])
    np.testing.assert_allclose(float(B.box_iou(a, b)[0, 0]), 50.0 / 150.0, rtol=1e-6)


def test_encode_decode_roundtrip(rng):
    n = 64
    x1 = rng.uniform(0, 300, n)
    y1 = rng.uniform(0, 300, n)
    gt = np.stack([x1, y1, x1 + rng.uniform(5, 100, n), y1 + rng.uniform(5, 100, n)], 1)
    px1 = rng.uniform(0, 300, n)
    py1 = rng.uniform(0, 300, n)
    props = np.stack(
        [px1, py1, px1 + rng.uniform(5, 100, n), py1 + rng.uniform(5, 100, n)], 1
    ).astype(np.float32)
    gt = gt.astype(np.float32)
    codes = B.encode_boxes(jnp.asarray(gt), jnp.asarray(props))
    back = B.decode_boxes(codes, jnp.asarray(props))
    np.testing.assert_allclose(np.asarray(back), gt, rtol=1e-3, atol=1e-2)


def test_decode_multiclass_interleave(rng):
    props = jnp.array([[10.0, 10.0, 50.0, 50.0]])
    codes = jnp.zeros((1, 8))  # 2 classes
    out = B.decode_boxes(codes, props)
    assert out.shape == (1, 8)
    # zero deltas → recover the proposal (center/size preserved with -1 on max)
    np.testing.assert_allclose(np.asarray(out[0, :4]), np.asarray(props[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[0, 4:]), np.asarray(props[0]), atol=1e-4)


def test_clip_and_flip():
    b = jnp.array([[-5.0, -5.0, 900.0, 700.0]])
    c = B.clip_boxes_to_image(b, (600, 800))
    np.testing.assert_allclose(np.asarray(c[0]), [0, 0, 799, 599])
    f = B.hflip_boxes(jnp.array([[10.0, 20.0, 30.0, 40.0]]), 100)
    np.testing.assert_allclose(np.asarray(f[0]), [69, 20, 89, 40])


def test_small_box_mask():
    b = jnp.array([[0.0, 0.0, 3.0, 10.0], [0.0, 0.0, 10.0, 10.0]])
    m = B.small_box_mask(b, min_size=5)
    assert not bool(m[0]) and bool(m[1])


def test_pad_boxes_helper(rng):
    bx = rng.uniform(0, 100, (3, 4)).astype(np.float32)
    lb = np.array([1, 2, 3])
    pb, pl, pm = B.pad_boxes(bx, lb, 8)
    assert pb.shape == (8, 4) and pm.sum() == 3 and pl[3:].sum() == 0
