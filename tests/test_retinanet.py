import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgd_tpu.config import FrozenCfg, get_cfg
from lgd_tpu.models.heads.retinanet import (
    RetinaNetCT,
    build_anchors,
    label_anchors,
    retinanet_inference,
    retinanet_losses,
)
from lgd_tpu.structures import BatchedInstances


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RetinaNet"
    cfg.MODEL.RESNETS.DEPTH = 18  # tiny for CPU tests
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.RESNETS.NORM = "FrozenBN"
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [
        [x, x * 2 ** (1 / 3), x * 2 ** (2 / 3)] for x in [32, 64, 128, 256, 512]
    ]
    cfg.MODEL.RETINANET.SMOOTH_L1_LOSS_BETA = 0.0
    cfg.freeze()
    return cfg


@pytest.fixture(scope="module")
def model_and_vars(tiny_cfg):
    model = RetinaNetCT(cfg=FrozenCfg(tiny_cfg), dtype=jnp.float32)
    imgs = jnp.zeros((2, 128, 128, 3), jnp.float32)
    sizes = jnp.array([[128, 128], [96, 64]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), imgs, sizes,
                           method=model.init_all)
    return model, variables


def test_resnet18_shapes_too_small_blocks():
    # ResNet-18 uses basic blocks in torch; our tiny test config still runs
    # bottlenecks — only shapes matter here.
    pass


def test_forward_shapes(tiny_cfg, model_and_vars):
    model, variables = model_and_vars
    imgs = jnp.zeros((2, 128, 128, 3), jnp.float32)
    sizes = jnp.array([[128, 128], [96, 64]], jnp.int32)
    raw, feats = model.apply(variables, imgs, sizes)
    assert set(feats.keys()) == {"p3", "p4", "p5", "p6", "p7"}
    assert feats["p3"].shape == (2, 16, 16, 256)
    assert feats["p7"].shape == (2, 1, 1, 256)
    # depth-18 here still means bottleneck blocks (2,2,2,2): res5 = 2048ch
    assert raw["res5"].shape[-1] == 2048

    logits, deltas = model.apply(
        variables, [feats[f] for f in ["p3", "p4", "p5", "p6", "p7"]],
        method=model.predict,
    )
    R = sum((128 // s) ** 2 * 9 for s in [8, 16, 32, 64, 128])
    assert logits.shape == (2, R, 80)
    assert deltas.shape == (2, R, 4)


def test_anchor_generation(tiny_cfg):
    anchors, counts = build_anchors(tiny_cfg, (128, 128))
    assert anchors.shape == (sum(counts), 4)
    assert counts[0] == 16 * 16 * 9
    # first anchor at grid (0,0), size 32, ar 0.5: w = sqrt(1024/0.5)=45.25
    w = anchors[0, 2] - anchors[0, 0]
    h = anchors[0, 3] - anchors[0, 1]
    np.testing.assert_allclose(w * h, 32 * 32, rtol=1e-5)
    np.testing.assert_allclose(h / w, 0.5, rtol=1e-5)


def test_label_anchors_and_losses(tiny_cfg):
    anchors, counts = build_anchors(tiny_cfg, (128, 128))
    gt = BatchedInstances.from_lists(
        [np.array([[20.0, 20.0, 60.0, 60.0]]), np.zeros((0, 4))],
        [np.array([5]), np.zeros((0,))],
        capacity=4,
    )
    gt_labels, gt_boxes = label_anchors(tiny_cfg, anchors, gt)
    R = anchors.shape[0]
    assert gt_labels.shape == (2, R)
    # image 0 has at least one positive (low-quality promotion guarantees it)
    assert int(jnp.sum((gt_labels[0] >= 0) & (gt_labels[0] != 80))) >= 1
    # empty image: everything background
    assert int(jnp.sum(gt_labels[1] != 80)) == 0

    logits = jnp.zeros((2, R, 80))
    deltas = jnp.zeros((2, R, 4))
    losses, new_norm = retinanet_losses(
        tiny_cfg, logits, deltas, gt_labels, gt_boxes, anchors, 100.0
    )
    assert jnp.isfinite(losses["loss_cls"]) and jnp.isfinite(losses["loss_box_reg"])
    assert new_norm < 100.0  # EMA moved toward the (small) positive count


def test_inference_finds_planted_box(tiny_cfg):
    anchors, counts = build_anchors(tiny_cfg, (128, 128))
    R = anchors.shape[0]
    logits = jnp.full((1, R, 80), -10.0)
    # plant a strong detection on anchor 100, class 7
    logits = logits.at[0, 100, 7].set(8.0)
    deltas = jnp.zeros((1, R, 4))
    dets = retinanet_inference(
        tiny_cfg, logits, deltas, anchors, counts, jnp.array([[128, 128]])
    )
    assert bool(dets.valid[0, 0])
    assert int(dets.classes[0, 0]) == 7
    expect = np.clip(anchors[100], 0, 128)
    np.testing.assert_allclose(np.asarray(dets.boxes[0, 0]), expect, atol=1e-3)
    # everything else below score threshold is invalid
    assert int(dets.valid[0].sum()) == 1
