"""FCOS / ATSS / POTO: assignment unit tests + distillator train-step smoke
tests on the synthetic mini split."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgd_tpu.config import get_cfg
from lgd_tpu.data import make_synthetic_batch
from lgd_tpu.engine import make_train_step
from lgd_tpu.models.distillator import build_model
from lgd_tpu.models.heads.fcos import build_shifts, fcos_ground_truth
from lgd_tpu.models.heads.atss import atss_ground_truth
from lgd_tpu.models.heads.poto import greedy_one_to_one
from lgd_tpu.structures import BatchedInstances


def make_cfg(meta_arch):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = meta_arch
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    for solver in (cfg.MODEL.DISTILLATOR.STUDENT.SOLVER,
                   cfg.MODEL.DISTILLATOR.TEACHER.SOLVER):
        solver.LR_SCHEDULER_NAME = "WarmupMultiStepLR"
        solver.BASE_LR = 0.01
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


def _gt(boxes, classes, capacity=4):
    return BatchedInstances.from_lists([np.asarray(boxes, np.float32)],
                                       [np.asarray(classes)], capacity)


def test_fcos_assignment_center_in_box():
    cfg = make_cfg("DistillatorFCOS")
    shifts, counts, strides, lo, hi = build_shifts(cfg, (128, 128))
    gt = _gt([[32, 32, 96, 96]], [5])
    cls, deltas, ctr = fcos_ground_truth(cfg, shifts, strides, lo, hi, gt)
    fg = (cls[0] != 80)
    assert int(fg.sum()) > 0
    # foreground shifts carry the right class, positive deltas, ctr in (0, 1]
    assert set(np.asarray(cls[0][fg]).tolist()) == {5}
    assert float(jnp.min(jnp.where(fg[:, None], deltas[0], 1.0))) > 0
    c = np.asarray(ctr[0][fg])
    assert (c > 0).all() and (c <= 1.0 + 1e-6).all()
    # the 64px object lands on p3 (soi [-1, 64]) only
    p3 = counts[0]
    assert int(fg[:p3].sum()) == int(fg.sum())


def test_fcos_assignment_min_area_tiebreak():
    cfg = make_cfg("DistillatorFCOS")
    shifts, counts, strides, lo, hi = build_shifts(cfg, (128, 128))
    # nested boxes, same center: small one must win the overlap
    gt = _gt([[40, 40, 88, 88], [56, 56, 72, 72]], [3, 7])
    cls, _, _ = fcos_ground_truth(cfg, shifts, strides, lo, hi, gt)
    # center shift (64, 64) on p3
    sh = np.asarray(shifts)
    center_idx = int(np.argmin(np.abs(sh[: counts[0]] - 64).sum(1)))
    assert int(cls[0][center_idx]) == 7


def test_atss_assignment():
    cfg = make_cfg("DistillatorATSS")
    shifts, counts, strides, *_ = build_shifts(cfg, (128, 128))
    gt = _gt([[20, 20, 80, 80]], [11])
    cls, deltas, ctr = atss_ground_truth(cfg, shifts, counts, strides, gt)
    fg = cls[0] != 80
    assert int(fg.sum()) > 0
    assert set(np.asarray(cls[0][fg]).tolist()) == {11}


def test_greedy_one_to_one_unique():
    q = jnp.array([
        [0.9, 0.8, 0.1],
        [0.85, 0.7, 0.2],
    ])
    assign = greedy_one_to_one(q)
    # gt0 takes col 0 (0.9), gt1 must take col 1 (0.7) not col 0
    np.testing.assert_array_equal(np.asarray(assign), [0, 1])


def test_greedy_one_to_one_masked():
    q = jnp.full((2, 3), -1e8)
    assign = greedy_one_to_one(q)
    np.testing.assert_array_equal(np.asarray(assign), [-1, -1])


@pytest.mark.parametrize("arch", ["DistillatorFCOS", "DistillatorATSS",
                                  "DistillatorPOTO"])
def test_distillator_train_step_smoke(arch):
    cfg = make_cfg(arch)
    model = build_model(cfg, dtype=jnp.float32)
    batch = make_synthetic_batch(batch_size=2, canvas_hw=(128, 128),
                                 max_instances=8, seed=1)
    init_state, train_step = make_train_step(cfg, model)
    state = init_state(jax.random.PRNGKey(0), batch)
    new_state, metrics = jax.jit(train_step)(state, batch)
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), (arch, k, v)
    assert "loss_cls.tea" in metrics and "loss_distill" in metrics
    if arch != "DistillatorPOTO":
        assert "loss_centerness" in metrics
