"""FastRCNN box-head loss golden vs a torch restatement of detectron2
FastRCNNOutputs (softmax CE mean over sampled proposals; smooth-L1 on the
foreground rows' class-specific deltas, sum / #sampled) — the loss the
reference's R-CNN students compute through detectron2 StandardROIHeads
(frcnn.py:59-76)."""

import numpy as np
import torch
import torch.nn.functional as TF

from lgd_tpu.config import get_cfg
from lgd_tpu.models.rcnn.roi_heads import fast_rcnn_losses
from lgd_tpu.structures import BatchedInstances


def oracle(scores, deltas, prop_boxes, gt_boxes_rows, classes, valid, is_fg,
           weights=(10.0, 10.0, 5.0, 5.0), beta=0.0, K=80):
    """One batch; all tensors torch. classes: K = background."""
    B, S = classes.shape
    loss_cls = torch.zeros(())
    loss_reg = torch.zeros(())
    n_valid = 0
    for b in range(B):
        v = valid[b]
        n_valid += int(v.sum())
        loss_cls = loss_cls + TF.cross_entropy(
            scores[b][v], classes[b][v], reduction="sum")
        fg = is_fg[b]
        if fg.any():
            p = prop_boxes[b][fg]
            g = gt_boxes_rows[b][fg]
            pw = p[:, 2] - p[:, 0]
            ph = p[:, 3] - p[:, 1]
            px = p[:, 0] + 0.5 * pw
            py = p[:, 1] + 0.5 * ph
            gw = g[:, 2] - g[:, 0]
            gh = g[:, 3] - g[:, 1]
            gx = g[:, 0] + 0.5 * gw
            gy = g[:, 1] + 0.5 * gh
            t = torch.stack([
                weights[0] * (gx - px) / pw,
                weights[1] * (gy - py) / ph,
                weights[2] * torch.log(gw / pw),
                weights[3] * torch.log(gh / ph)], dim=1)
            d = deltas[b][fg].reshape(-1, K, 4)[
                torch.arange(int(fg.sum())), classes[b][fg]]
            diff = (d - t).abs()
            if beta < 1e-5:
                loss_reg = loss_reg + diff.sum()
            else:
                loss_reg = loss_reg + torch.where(
                    diff < beta, 0.5 * diff ** 2 / beta,
                    diff - 0.5 * beta).sum()
    return loss_cls / max(n_valid, 1), loss_reg / max(n_valid, 1)


def test_fast_rcnn_losses_match_detectron2_oracle():
    rng = np.random.RandomState(0)
    cfg = get_cfg()
    cfg.freeze()
    B, S, K, M = 2, 24, 80, 6

    def rand_boxes(n):
        x1 = rng.rand(n) * 80
        y1 = rng.rand(n) * 60
        return np.stack([x1, y1, x1 + 5 + rng.rand(n) * 40,
                         y1 + 5 + rng.rand(n) * 40], 1).astype(np.float32)

    gt = BatchedInstances.from_lists(
        [rand_boxes(M), rand_boxes(M)],
        [rng.randint(0, K, M), rng.randint(0, K, M)], capacity=M)
    sampled = {
        "boxes": np.stack([rand_boxes(S), rand_boxes(S)]),
        "classes": rng.randint(0, K + 1, (B, S)).astype(np.int32),
        "matched_gt": rng.randint(0, M, (B, S)).astype(np.int32),
        "valid": rng.rand(B, S) > 0.1,
        "is_fg": np.zeros((B, S), bool),
    }
    # fg rows must be valid and have a real (fg) class
    sampled["is_fg"] = (sampled["valid"]
                        & (rng.rand(B, S) > 0.6)
                        & (sampled["classes"] < K))
    scores = rng.randn(B, S, K + 1).astype(np.float32)
    deltas = (rng.randn(B, S, K * 4) * 0.3).astype(np.float32)

    got = fast_rcnn_losses(cfg, scores, deltas, sampled, gt)

    gt_rows = np.take_along_axis(
        np.asarray(gt.boxes), sampled["matched_gt"][..., None], axis=1)
    want_cls, want_reg = oracle(
        torch.tensor(scores), torch.tensor(deltas),
        torch.tensor(sampled["boxes"]), torch.tensor(gt_rows),
        torch.tensor(sampled["classes"].astype(np.int64)),
        torch.tensor(sampled["valid"]), torch.tensor(sampled["is_fg"]))
    np.testing.assert_allclose(float(got["loss_cls"]), float(want_cls),
                               rtol=1e-5)
    np.testing.assert_allclose(float(got["loss_box_reg"]), float(want_reg),
                               rtol=1e-4)
