"""DynamicTeacher component tests: inside-GT masks vs the reference formula,
mask pooling normalization, rendering scatter, and full-teacher shape/finite
checks including the segmask (LOAD_LABELMAP) path."""

import jax
import jax.numpy as jnp
import numpy as np

from lgd_tpu.models.lgd.dynamic_teacher import (
    DynamicTeacher,
    inside_gt_masks,
    segmask_inside_masks,
)
from lgd_tpu.structures import BatchedInstances


def ref_inside_mask(boxes, src_hw, dst_hw):
    """Direct numpy port of the reference get_inside_gt_mask
    (dynamic_teacher/utils.py:53-89) for one image."""
    H, W = src_hw
    h, w = dst_hw
    b = boxes.copy().astype(np.float64)
    b[:, [0, 2]] *= w / W
    b[:, [1, 3]] *= h / H
    xc = (b[:, 0] + b[:, 2]) * 0.5
    yc = (b[:, 1] + b[:, 3]) * 0.5
    ww = b[:, 2] - b[:, 0]
    hh = b[:, 3] - b[:, 1]
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    out = np.zeros((len(b), h * w), np.float32)
    for i in range(len(b)):
        dy = np.abs(yc[i] - ys) / max(hh[i], 1e-6)
        dx = np.abs(xc[i] - xs) / max(ww[i], 1e-6)
        out[i] = ((dy <= 0.5) & (dx <= 0.5)).reshape(-1)
    return out


def test_inside_gt_masks_matches_reference_formula():
    boxes = np.array([
        [8.0, 16.0, 72.0, 48.0],
        [0.0, 0.0, 127.0, 95.0],
        [40.0, 40.0, 44.0, 43.0],   # tiny box
    ], np.float32)
    src = (96, 128)
    for dst in [(12, 16), (6, 8), (3, 4)]:
        ours = np.asarray(inside_gt_masks(jnp.asarray(boxes)[None], src, dst))[0]
        ref = ref_inside_mask(boxes, src, dst)
        np.testing.assert_array_equal(ours, ref)


def test_segmask_inside_masks_nearest():
    bm = np.zeros((1, 2, 8, 8), np.uint8)
    bm[0, 0, :4, :4] = 1        # top-left quadrant
    bm[0, 1, 4:, :] = 1         # bottom half
    is_ctx = jnp.array([False, False, True])
    m = segmask_inside_masks(jnp.asarray(bm), is_ctx, (4, 4))
    m = np.asarray(m).reshape(1, 3, 4, 4)
    assert m[0, 0, :2, :2].all() and not m[0, 0, 2:, :].any()
    assert m[0, 1, 2:, :].all() and not m[0, 1, :2, :].any()
    assert m[0, 2].all()  # ctx slot = ones


def _teacher_setup(add_ctx, use_seg):
    teacher = DynamicTeacher(
        num_classes=80, channels=64, num_heads=4,
        interact_pattern="stuGuided", add_context_box=add_ctx,
        use_seg_map=use_seg, dtype=jnp.float32)
    gt = BatchedInstances.from_lists(
        [np.array([[8, 8, 40, 40], [20, 10, 60, 44]], np.float32),
         np.zeros((0, 4), np.float32)],
        [np.array([2, 9]), np.zeros((0,), np.int64)],
        capacity=4,
        masks49_list=[np.ones((2, 49), np.float32), None] if use_seg else None,
        bitmasks_list=[np.ones((2, 8, 8), np.uint8),
                       np.zeros((0, 8, 8), np.uint8)] if use_seg else None,
    )
    feats = {
        "p3": jnp.ones((2, 8, 8, 64)),
        "p4": jnp.ones((2, 4, 4, 64)),
    }
    return teacher, gt, feats


def test_dynamic_teacher_forward_shapes_and_finite():
    for add_ctx in (False, True):
        teacher, gt, feats = _teacher_setup(add_ctx, use_seg=False)
        variables = teacher.init(jax.random.PRNGKey(0), gt, feats, (64, 64))
        tea, masks, valid = teacher.apply(variables, gt, feats, (64, 64))
        assert set(tea.keys()) == {"p3", "p4"}
        for k in tea:
            assert tea[k].shape == feats[k].shape
            assert bool(jnp.isfinite(tea[k]).all())
        Mp = 4 + (1 if add_ctx else 0)
        assert valid.shape == (2, Mp)
        # empty image: only the fallback token valid (ctx not added)
        assert int(valid[1].sum()) == 1


def test_dynamic_teacher_segmask_path():
    teacher, gt, feats = _teacher_setup(add_ctx=False, use_seg=True)
    variables = teacher.init(jax.random.PRNGKey(0), gt, feats, (64, 64))
    tea, masks, valid = teacher.apply(variables, gt, feats, (64, 64))
    for k in tea:
        assert bool(jnp.isfinite(tea[k]).all())
    # segmask masks come from the rasterized bitmasks, zeroed on invalid rows
    assert float(masks["p3"][1, 0].max()) == 0.0 or int(valid[1, 0]) == 1


def test_interact_patterns_all_run():
    for pattern in ("stuGuided", "labelGuided", "student_fill",
                    "teacher_fill"):
        teacher = DynamicTeacher(
            num_classes=80, channels=64, num_heads=4,
            interact_pattern=pattern, add_context_box=False,
            dtype=jnp.float32)
        gt = BatchedInstances.from_lists(
            [np.array([[4, 4, 30, 30]], np.float32)], [np.array([1])],
            capacity=2)
        feats = {"p3": jnp.ones((1, 8, 8, 64))}
        variables = teacher.init(jax.random.PRNGKey(0), gt, feats, (64, 64))
        tea, _, _ = teacher.apply(variables, gt, feats, (64, 64))
        assert bool(jnp.isfinite(tea["p3"]).all()), pattern
