"""R-CNN stack tests: ROIAlign hand values, RPN proposal machinery, and
Faster/Mask R-CNN LGD distillator train-step smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgd_tpu.config import get_cfg
from lgd_tpu.data import make_synthetic_batch
from lgd_tpu.engine import make_train_step
from lgd_tpu.models.distillator import build_model
from lgd_tpu.models.rcnn.rpn import subsample_labels
from lgd_tpu.ops.roi_align import assign_fpn_levels, multilevel_roi_align


def test_roi_align_constant_map():
    # constant feature map -> pooled output equals the constant
    f = [jnp.full((1, 16, 16, 8), 3.0)]
    boxes = jnp.array([[[8.0, 8.0, 56.0, 56.0]]])  # stride 4 -> cells 2..14
    out = multilevel_roi_align(f, boxes, jnp.array([[True]]), [4], 7, 2)
    assert out.shape == (1, 1, 7, 7, 8)
    np.testing.assert_allclose(np.asarray(out), 3.0, rtol=1e-5)


def test_roi_align_linear_gradient_map():
    # feature = x coordinate; pooled bins should follow the box's x range
    xs = jnp.arange(16, dtype=jnp.float32)
    f = [jnp.broadcast_to(xs[None, None, :, None], (1, 16, 16, 1))]
    boxes = jnp.array([[[0.0, 0.0, 64.0, 64.0]]])  # whole map at stride 4
    out = multilevel_roi_align(f, boxes, jnp.array([[True]]), [4], 4, 2)
    vals = np.asarray(out)[0, 0, 0, :, 0]
    # 4 bins over cells [-0.5, 15.5]: ascending, evenly spaced
    assert (np.diff(vals) > 0).all()
    np.testing.assert_allclose(np.diff(vals), np.full(3, vals[1] - vals[0]),
                               rtol=1e-4)


def test_roi_align_invalid_rois_zero():
    f = [jnp.full((1, 8, 8, 4), 5.0)]
    boxes = jnp.zeros((1, 2, 4))
    valid = jnp.array([[False, False]])
    out = multilevel_roi_align(f, boxes, valid, [4], 7, 2)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_assign_fpn_levels():
    boxes = jnp.array([
        [0, 0, 112, 112],   # sqrt(area)=112 -> level 3
        [0, 0, 224, 224],   # -> level 4
        [0, 0, 448, 448],   # -> level 5
        [0, 0, 20, 20],     # tiny -> clamped to 2
    ], dtype=jnp.float32)
    lv = assign_fpn_levels(boxes, 2, 5)
    np.testing.assert_array_equal(np.asarray(lv), [3, 4, 5, 2])


def test_subsample_labels_counts():
    rng = jax.random.PRNGKey(0)
    labels = jnp.array([1] * 300 + [0] * 700 + [-1] * 100)
    pos, neg = subsample_labels(labels, 256, 0.5, rng)
    assert int(pos.sum()) == 128  # capped at 50% of 256
    assert int(neg.sum()) == 128
    assert not bool((pos & (labels != 1)).any())
    assert not bool((neg & (labels != 0)).any())


def test_subsample_labels_few_positives():
    rng = jax.random.PRNGKey(1)
    labels = jnp.array([1] * 10 + [0] * 1000)
    pos, neg = subsample_labels(labels, 256, 0.5, rng)
    assert int(pos.sum()) == 10
    assert int(neg.sum()) == 246


def make_rcnn_cfg(mask_on=False):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "DistillatorGeneralizedRCNN"
    # the default BACKBONE.NAME is the C4 trunk (detectron2 default);
    # this test runs the FPN stack like Base-RCNN-FPN.yaml
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.MASK_ON = mask_on
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 4
    cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 14
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 200
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 100
    cfg.MODEL.DISTILLATOR.TEACHER.DETACH_APPEARANCE_EMBED = True
    if mask_on:
        cfg.MODEL.DISTILLATOR.LABEL_ENCODER.LOAD_LABELMAP = True
    for solver in (cfg.MODEL.DISTILLATOR.STUDENT.SOLVER,
                   cfg.MODEL.DISTILLATOR.TEACHER.SOLVER):
        solver.LR_SCHEDULER_NAME = "WarmupMultiStepLR"
        solver.BASE_LR = 0.02
        solver.STEPS = (100,)
        solver.GAMMA = 0.1
        solver.WARMUP_FACTOR = 1e-3
        solver.WARMUP_ITERS = 10
        solver.WARMUP_METHOD = "linear"
    cfg.MODEL.DISTILLATOR.PRE_NONDISTILL_ITERS = 0
    cfg.MODEL.DISTILLATOR.PRE_FREEZE_STUDENT_BACKBONE_ITERS = 0
    cfg.SOLVER.MAX_ITER = 200
    cfg.TPU.MAX_INSTANCES = 8
    cfg.freeze()
    return cfg


@pytest.mark.parametrize("mask_on", [False, True])
def test_rcnn_distillator_train_step(mask_on):
    cfg = make_rcnn_cfg(mask_on)
    model = build_model(cfg, dtype=jnp.float32)
    batch = make_synthetic_batch(batch_size=2, canvas_hw=(128, 128),
                                 max_instances=8, seed=2,
                                 with_masks=mask_on)
    init_state, train_step = make_train_step(cfg, model)
    state = init_state(jax.random.PRNGKey(0), batch)
    new_state, metrics = jax.jit(train_step)(state, batch)
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), (k, float(v))
    for key in ("loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg",
                "loss_rpn_cls.tea", "loss_distill"):
        assert key in metrics, key
    if mask_on:
        assert "loss_mask" in metrics and "loss_mask.tea" in metrics
