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


def _naive_detect(cfg, logits, deltas, shifts, level_counts, image_sizes,
                  ctr=None, nms_type="normal"):
    """Numpy oracle for fcos/poto_inference: flat per-level top-k on sigmoid
    probs -> threshold -> decode -> class-offset greedy NMS -> top max_dets."""
    from lgd_tpu.structures import Shift2BoxTransform

    K = logits.shape[-1]
    topk_cand = cfg.MODEL.FCOS.TOPK_CANDIDATES_TEST
    score_thresh = cfg.MODEL.FCOS.SCORE_THRESH_TEST
    nms_thresh = cfg.MODEL.FCOS.NMS_THRESH_TEST
    max_dets = cfg.TEST.DETECTIONS_PER_IMAGE
    tf = Shift2BoxTransform(tuple(cfg.MODEL.FCOS.BBOX_REG_WEIGHTS))
    offsets = np.concatenate([[0], np.cumsum(level_counts)])
    out = []
    for b in range(logits.shape[0]):
        cand = []
        for li in range(len(level_counts)):
            s, e = int(offsets[li]), int(offsets[li + 1])
            probs = 1.0 / (1.0 + np.exp(-logits[b, s:e].reshape(-1)))
            k = min(topk_cand, probs.shape[0])
            order = np.argsort(-probs, kind="stable")[:k]
            for fi in order:
                p = probs[fi]
                if p <= score_thresh:
                    continue
                si, ci = fi // K, fi % K
                box = np.asarray(tf.apply_deltas(
                    jnp.asarray(deltas[b, s + si]), jnp.asarray(shifts[s + si])))
                if ctr is not None:
                    cp = 1.0 / (1.0 + np.exp(-ctr[b, s + si, 0]))
                    score = np.sqrt(p * cp)
                else:
                    score = p
                h, w = image_sizes[b]
                box = np.clip(box, [0, 0, 0, 0], [w, h, w, h])
                cand.append((float(score), int(ci), box))
        cand.sort(key=lambda t: -t[0])
        cand = cand[:2000]
        kept = []
        if nms_type == "null":
            kept = list(range(len(cand)))
        else:
            for i, (sc, ci, box) in enumerate(cand):
                ok = True
                for j in kept:
                    sj, cj, bj = cand[j]
                    if cj != ci:
                        continue
                    x1 = max(box[0], bj[0]); y1 = max(box[1], bj[1])
                    x2 = min(box[2], bj[2]); y2 = min(box[3], bj[3])
                    inter = max(0, x2 - x1) * max(0, y2 - y1)
                    a1 = (box[2] - box[0]) * (box[3] - box[1])
                    a2 = (bj[2] - bj[0]) * (bj[3] - bj[1])
                    iou = inter / max(a1 + a2 - inter, 1e-9)
                    if iou > nms_thresh:
                        ok = False
                        break
                if ok:
                    kept.append(i)
        out.append([cand[i] for i in kept[:max_dets]])
    return out


def _assert_matches_naive(dets, naive, b):
    got = [(round(float(s), 4), int(c)) for s, c, v in zip(
        np.asarray(dets.scores[b]), np.asarray(dets.classes[b]),
        np.asarray(dets.valid[b])) if v]
    want = [(round(sc, 4), ci) for sc, ci, _ in naive[b]]
    assert got == want


def test_fcos_inference_matches_naive():
    cfg = make_cfg("DistillatorFCOS")
    from lgd_tpu.models.heads.fcos import fcos_inference

    rng = np.random.RandomState(0)
    level_counts = [64, 16]
    R = sum(level_counts)
    B, K = 2, 8
    logits = rng.randn(B, R, K).astype(np.float32) * 2
    deltas = np.abs(rng.randn(B, R, 4)).astype(np.float32) * 10
    ctr = rng.randn(B, R, 1).astype(np.float32)
    shifts = (rng.rand(R, 2) * 100).astype(np.float32)
    sizes = np.asarray([[128, 128], [96, 120]], np.int32)
    dets = fcos_inference(cfg, jnp.asarray(logits), jnp.asarray(deltas),
                          jnp.asarray(ctr), shifts, level_counts,
                          jnp.asarray(sizes))
    naive = _naive_detect(cfg, logits, deltas, shifts, level_counts, sizes,
                          ctr=ctr)
    for b in range(B):
        _assert_matches_naive(dets, naive, b)


@pytest.mark.parametrize("nms_type", ["normal", "null"])
def test_poto_inference_matches_naive(nms_type):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "DistillatorPOTO"
    cfg.MODEL.NMS_TYPE = nms_type
    cfg.freeze()
    from lgd_tpu.models.heads.poto import poto_inference

    rng = np.random.RandomState(1)
    level_counts = [48, 12]
    R = sum(level_counts)
    B, K = 2, 6
    logits = rng.randn(B, R, K).astype(np.float32) * 2
    deltas = np.abs(rng.randn(B, R, 4)).astype(np.float32) * 10
    shifts = (rng.rand(R, 2) * 100).astype(np.float32)
    sizes = np.asarray([[128, 128], [90, 110]], np.int32)
    dets = poto_inference(cfg, jnp.asarray(logits), jnp.asarray(deltas),
                          shifts, level_counts, jnp.asarray(sizes))
    naive = _naive_detect(cfg, logits, deltas, shifts, level_counts, sizes,
                          nms_type=nms_type)
    for b in range(B):
        _assert_matches_naive(dets, naive, b)
