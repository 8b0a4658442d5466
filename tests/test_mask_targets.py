"""Mask-head target accuracy vs exact polygon crop-and-resize.

detectron2 computes mask targets by re-rasterizing each GT polygon in its
matched *proposal's* frame at 28x28 (PolygonMasks.crop_and_resize, used by
mask_rcnn_loss; reference dependency via frcnn.py ROI heads). That is
data-dependent host work, so lgd_tpu instead rasterizes each polygon ONCE,
exactly, in its GT-box frame at 2x resolution (TPU.MASK_CROP_SIZE=56) and
resamples on device onto the proposal grid (roi_heads.crop_gt_frame_masks).
This test quantifies that approximation against the exact oracle — and
against the old stride-8 canvas raster it replaces (VERDICT r1 #6)."""

import numpy as np

from lgd_tpu.data.dataset_mapper import (
    crop_and_resize_mask,
    rasterize_polygons,
)
from lgd_tpu.models.rcnn.roi_heads import crop_bitmasks, crop_gt_frame_masks


def _blob_polygon(rng, cx, cy, r_mean):
    """Irregular star-shaped polygon around (cx, cy)."""
    K = 14
    ang = np.linspace(0, 2 * np.pi, K, endpoint=False)
    r = r_mean * (0.6 + 0.8 * rng.rand(K))
    xs = cx + r * np.cos(ang)
    ys = cy + r * np.sin(ang)
    return np.stack([xs, ys], axis=1).reshape(-1)


def _mask_iou(a, b):
    a, b = a.astype(bool), b.astype(bool)
    union = (a | b).sum()
    return 1.0 if union == 0 else (a & b).sum() / union


def test_gt_frame_crops_match_exact_polygon_targets():
    rng = np.random.RandomState(0)
    out = 28
    G = 56
    canvas = 512
    stride = 8
    ious_new, ious_old = [], []
    for trial in range(12):
        poly = _blob_polygon(rng, 150 + rng.rand() * 200,
                             150 + rng.rand() * 200,
                             20 + rng.rand() * 80)
        xs, ys = poly[0::2], poly[1::2]
        gt_box = np.asarray([xs.min(), ys.min(), xs.max(), ys.max()],
                            np.float32)
        # proposal: jittered GT box (IoU >= 0.5 regime of fg proposals)
        jit = (rng.rand(4) - 0.5) * 0.25 * np.asarray(
            [gt_box[2] - gt_box[0], gt_box[3] - gt_box[1]] * 2)
        prop = (gt_box + jit).astype(np.float32)

        # exact oracle: rasterize the polygon in the PROPOSAL frame @ out
        want = crop_and_resize_mask([poly], prop, size=out, flatten=False)

        # new path: GT-frame 2x crop resampled on device
        crop = crop_and_resize_mask([poly], gt_box, size=G, flatten=False)
        got = np.asarray(crop_gt_frame_masks(
            crop[None, None].astype(np.uint8),
            gt_box[None, None],
            np.zeros((1, 1), np.int32),
            prop[None, None], out))[0, 0]

        # old path: stride-8 canvas raster
        full = rasterize_polygons([poly], canvas, canvas)
        bm = full[::stride, ::stride][None, None]
        old = np.asarray(crop_bitmasks(
            bm.astype(np.uint8), np.zeros((1, 1), np.int32),
            prop[None, None], out, stride))[0, 0]

        ious_new.append(_mask_iou(got, want))
        ious_old.append(_mask_iou(old, want))

    mean_new, mean_old = np.mean(ious_new), np.mean(ious_old)
    # measured: GT-frame 2x resampling is near-exact (>=0.93 mean IoU vs
    # the per-proposal rasterization) and strictly better than the stride-8
    # raster it replaces
    assert mean_new >= 0.93, (mean_new, ious_new)
    assert min(ious_new) >= 0.85, ious_new
    assert mean_new > mean_old, (mean_new, mean_old)
    print(f"mask-target IoU vs exact: new={mean_new:.4f} old={mean_old:.4f}")


def test_gt_frame_crops_exact_for_box_filling_masks():
    """A mask that fills its GT box must produce targets that exactly equal
    the proposal/GT intersection grid."""
    G = 56
    gt_box = np.asarray([100.0, 100.0, 200.0, 180.0], np.float32)
    crop = np.ones((1, 1, G, G), np.uint8)
    prop = np.asarray([[[121.0, 91.0, 219.0, 171.0]]], np.float32)
    out = 28
    got = np.asarray(crop_gt_frame_masks(
        crop, gt_box[None, None], np.zeros((1, 1), np.int32), prop, out)
    )[0, 0]
    g = (np.arange(out) + 0.5) / out
    px = prop[0, 0, 0] + (prop[0, 0, 2] - prop[0, 0, 0]) * g
    py = prop[0, 0, 1] + (prop[0, 0, 3] - prop[0, 0, 1]) * g
    # border-clamp bilinear keeps value 1 up to half a crop pixel past the
    # box edge (and 0 beyond a full pixel; between them weight >= 0.5 holds
    # until the half-pixel mark on an all-ones crop)
    ex = 0.5 * (gt_box[2] - gt_box[0]) / G
    ey = 0.5 * (gt_box[3] - gt_box[1]) / G
    want = ((px[None, :] > gt_box[0] - ex) & (px[None, :] < gt_box[2] + ex)
            & (py[:, None] > gt_box[1] - ey) & (py[:, None] < gt_box[3] + ey))
    np.testing.assert_array_equal(got.astype(bool), want)
