"""FCOS / ATSS GT-assignment goldens vs torch restatements of the vendored
cvpods heads (reference thirdparty_heads/fcos.py:177-284 and
atss.py:236-330): center sampling, size-of-interest gating, min-area
tie-break (FCOS); per-level top-k by center distance, mean+sample-std IoU
threshold, in-box gate, max-IoU tie-break (ATSS). Randomized boxes, exact
comparisons."""

import math

import numpy as np
import torch

from lgd_tpu.config import get_cfg
from lgd_tpu.models.heads.atss import atss_ground_truth
from lgd_tpu.models.heads.fcos import build_shifts, fcos_ground_truth
from lgd_tpu.structures import BatchedInstances


def _shift_deltas(shifts, boxes):
    """Shift2BoxTransform.get_deltas (weights 1): (R,2),(...,4)->(...,R,4)"""
    return torch.cat([
        shifts - boxes[..., :2], boxes[..., 2:] - shifts], dim=-1)


def fcos_oracle(shifts_per_level, strides, soi, boxes, classes, radius,
                num_classes=80):
    shifts = torch.cat(shifts_per_level)
    R = len(shifts)
    soi_full = torch.cat([
        torch.tensor(s, dtype=torch.float32).expand(len(sh), 2)
        for sh, s in zip(shifts_per_level, soi)])
    deltas = _shift_deltas(shifts, boxes.unsqueeze(1))
    if radius > 0:
        centers = (boxes[:, :2] + boxes[:, 2:]) / 2
        is_in = []
        for stride, sh in zip(strides, shifts_per_level):
            r = stride * radius
            cb = torch.cat([torch.max(centers - r, boxes[:, :2]),
                            torch.min(centers + r, boxes[:, 2:])], dim=-1)
            cd = _shift_deltas(sh, cb.unsqueeze(1))
            is_in.append(cd.min(dim=-1).values > 0)
        is_in = torch.cat(is_in, dim=1)
    else:
        is_in = deltas.min(dim=-1).values > 0
    max_d = deltas.max(dim=-1).values
    cared = (max_d >= soi_full[None, :, 0]) & (max_d <= soi_full[None, :, 1])
    area = ((boxes[:, 2] - boxes[:, 0])
            * (boxes[:, 3] - boxes[:, 1])).unsqueeze(1).repeat(1, R)
    area[~is_in] = math.inf
    area[~cared] = math.inf
    min_area, matched = area.min(dim=0)
    gt_cls = classes[matched].clone()
    gt_cls[min_area == math.inf] = num_classes
    gt_deltas = _shift_deltas(shifts, boxes[matched])
    lr = gt_deltas[:, [0, 2]]
    tb = gt_deltas[:, [1, 3]]
    ctr = torch.sqrt(
        (lr.min(-1).values / lr.max(-1).values).clamp(min=0)
        * (tb.min(-1).values / tb.max(-1).values).clamp(min=0))
    return gt_cls, gt_deltas, ctr


def atss_oracle(shifts_per_level, strides, boxes, classes, anchor_scale,
                topk, num_classes=80):
    shifts = torch.cat(shifts_per_level)
    deltas = _shift_deltas(shifts, boxes.unsqueeze(1))
    is_in = deltas.min(dim=-1).values > 0

    def iou(b1, b2):
        a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
        a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
        lt = torch.max(b1[:, None, :2], b2[None, :, :2])
        rb = torch.min(b1[:, None, 2:], b2[None, :, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        return inter / (a1[:, None] + a2[None] - inter)

    ious, cands = [], []
    base = 0
    centers = (boxes[:, :2] + boxes[:, 2:]) / 2
    for stride, sh in zip(strides, shifts_per_level):
        anch = torch.cat([sh - stride * anchor_scale / 2,
                          sh + stride * anchor_scale / 2], dim=1)
        ious.append(iou(boxes, anch))
        dist = (centers.unsqueeze(1) - sh).pow(2).sum(-1).sqrt()
        _, idx = dist.topk(min(topk, len(sh)), dim=1, largest=False)
        cands.append(base + idx)
        base += len(sh)
    ious = torch.cat(ious, dim=1)
    cands = torch.cat(cands, dim=1)
    cand_ious = ious.gather(1, cands)
    thr = cand_ious.mean(1, keepdim=True) + cand_ious.std(1, keepdim=True)
    fg = torch.zeros_like(is_in).scatter_(1, cands, True)
    fg &= ious >= thr
    q = ious.clone()
    q[~is_in] = -1
    q[~fg] = -1
    max_q, matched = q.max(dim=0)
    gt_cls = classes[matched].clone()
    gt_cls[max_q == -1] = num_classes
    gt_deltas = _shift_deltas(shifts, boxes[matched])
    lr = gt_deltas[:, [0, 2]]
    tb = gt_deltas[:, [1, 3]]
    ctr = torch.sqrt(
        (lr.min(-1).values / lr.max(-1).values).clamp(min=0)
        * (tb.min(-1).values / tb.max(-1).values).clamp(min=0))
    return gt_cls, gt_deltas, ctr


def _fixture(rng, B=2, M=6, hw=(64, 96)):
    cfg = get_cfg()
    cfg.MODEL.FCOS.FPN_STRIDES = [8, 16, 32]
    cfg.MODEL.FCOS.OBJECT_SIZES_OF_INTEREST = [
        [-1, 32], [32, 64], [64, float("inf")]]
    cfg.freeze()
    shifts, counts, strides, soi_lo, soi_hi = build_shifts(cfg, hw)
    boxes_list, cls_list = [], []
    for _ in range(B):
        x1 = rng.rand(M) * 60
        y1 = rng.rand(M) * 40
        w = 6 + rng.rand(M) * 60
        h = 6 + rng.rand(M) * 40
        boxes_list.append(np.stack(
            [x1, y1, np.minimum(x1 + w, 96), np.minimum(y1 + h, 64)],
            axis=1).astype(np.float32))
        cls_list.append(rng.randint(0, 80, M))
    gt = BatchedInstances.from_lists(boxes_list, cls_list, capacity=M + 2)
    offs = np.concatenate([[0], np.cumsum(counts)])
    shifts_per_level = [torch.tensor(shifts[offs[i]:offs[i + 1]])
                        for i in range(len(counts))]
    return (cfg, shifts, counts, strides, soi_lo, soi_hi, gt,
            shifts_per_level, boxes_list, cls_list)


def test_fcos_assignment_matches_cvpods_oracle():
    rng = np.random.RandomState(0)
    (cfg, shifts, counts, strides, soi_lo, soi_hi, gt,
     spl, boxes_list, cls_list) = _fixture(rng)
    soi = cfg.MODEL.FCOS.OBJECT_SIZES_OF_INTEREST
    got_cls, got_deltas, got_ctr = fcos_ground_truth(
        cfg, shifts, strides, soi_lo, soi_hi, gt)
    for b in range(len(boxes_list)):
        want_cls, want_deltas, want_ctr = fcos_oracle(
            spl, cfg.MODEL.FCOS.FPN_STRIDES, soi,
            torch.tensor(boxes_list[b]), torch.tensor(cls_list[b]),
            cfg.MODEL.FCOS.CENTER_SAMPLING_RADIUS)
        np.testing.assert_array_equal(np.asarray(got_cls[b]),
                                      want_cls.numpy(), err_msg=f"img {b}")
        fg = want_cls.numpy() != 80
        np.testing.assert_allclose(np.asarray(got_deltas[b])[fg],
                                   want_deltas.numpy()[fg], atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_ctr[b])[fg],
                                   want_ctr.numpy()[fg], atol=1e-5)


def test_atss_assignment_matches_cvpods_oracle():
    rng = np.random.RandomState(1)
    (cfg, shifts, counts, strides, soi_lo, soi_hi, gt,
     spl, boxes_list, cls_list) = _fixture(rng)
    got_cls, got_deltas, got_ctr = atss_ground_truth(
        cfg, shifts, counts, strides, gt)
    for b in range(len(boxes_list)):
        want_cls, want_deltas, want_ctr = atss_oracle(
            spl, cfg.MODEL.FCOS.FPN_STRIDES,
            torch.tensor(boxes_list[b]), torch.tensor(cls_list[b]),
            cfg.MODEL.ATSS.ANCHOR_SCALE, cfg.MODEL.ATSS.TOPK)
        np.testing.assert_array_equal(np.asarray(got_cls[b]),
                                      want_cls.numpy(), err_msg=f"img {b}")
        fg = want_cls.numpy() != 80
        np.testing.assert_allclose(np.asarray(got_deltas[b])[fg],
                                   want_deltas.numpy()[fg], atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_ctr[b])[fg],
                                   want_ctr.numpy()[fg], atol=1e-5)
