import jax.numpy as jnp
import numpy as np

from lgd_tpu.structures import (
    Box2BoxTransform,
    Shift2BoxTransform,
    area,
    clip,
    matched_boxlist_iou,
    pairwise_iou,
)


def test_area_and_clip():
    b = jnp.array([[0.0, 0.0, 10.0, 5.0], [-5.0, -5.0, 20.0, 20.0]])
    np.testing.assert_allclose(area(b), [50.0, 625.0])
    c = clip(b, 10, 15)
    np.testing.assert_allclose(c[1], [0.0, 0.0, 15.0, 10.0])


def test_pairwise_iou_hand_values():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0], [20.0, 20.0, 30.0, 30.0]])
    iou = pairwise_iou(a, b)
    np.testing.assert_allclose(iou[0], [1.0, 25.0 / 175.0, 0.0], rtol=1e-6)


def test_pairwise_iou_batched():
    a = jnp.zeros((2, 3, 4))
    b = jnp.zeros((2, 5, 4))
    assert pairwise_iou(a, b).shape == (2, 3, 5)


def test_matched_iou():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    np.testing.assert_allclose(matched_boxlist_iou(a, a), [1.0])


def test_box2box_roundtrip():
    tf = Box2BoxTransform(weights=(1.0, 1.0, 1.0, 1.0))
    src = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 25.0, 15.0]])
    tgt = jnp.array([[1.0, 2.0, 11.0, 13.0], [0.0, 0.0, 30.0, 10.0]])
    deltas = tf.get_deltas(src, tgt)
    rec = tf.apply_deltas(deltas, src)
    np.testing.assert_allclose(rec, tgt, atol=2e-3)


def test_box2box_weights():
    tf = Box2BoxTransform(weights=(10.0, 10.0, 5.0, 5.0))
    src = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    tgt = jnp.array([[2.0, 0.0, 12.0, 10.0]])
    d = tf.get_deltas(src, tgt)
    # dx = (cx_t - cx_s)/w * wx = (7-5)/10*10 = 2
    np.testing.assert_allclose(d[0], [2.0, 0.0, 0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(tf.apply_deltas(d, src), tgt, atol=1e-4)


def test_shift2box_roundtrip():
    tf = Shift2BoxTransform(weights=(1.0, 1.0, 1.0, 1.0))
    shifts = jnp.array([[4.0, 4.0], [100.0, 50.0]])
    boxes = jnp.array([[0.0, 0.0, 10.0, 10.0], [90.0, 40.0, 120.0, 80.0]])
    deltas = tf.get_deltas(shifts, boxes)
    np.testing.assert_allclose(deltas[0], [4.0, 4.0, 6.0, 6.0])
    rec = tf.apply_deltas(deltas, shifts)
    np.testing.assert_allclose(rec, boxes, atol=1e-5)


def test_shift2box_broadcast_over_gt():
    # (R, 2) shifts vs (M, 1, 4) boxes -> (M, R, 4) like the reference's
    # get_deltas(shifts, gt_boxes.unsqueeze(1)) (fcos.py:222-223)
    tf = Shift2BoxTransform()
    shifts = jnp.zeros((7, 2))
    boxes = jnp.zeros((3, 1, 4))
    assert tf.get_deltas(shifts, boxes).shape == (3, 7, 4)
