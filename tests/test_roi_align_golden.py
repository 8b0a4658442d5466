"""ROIAlign golden: lgd_tpu.ops.roi_align vs a scalar-loop oracle that
restates detectron2's ROIAlign CUDA kernel (ROIAlign_forward_kernel,
detectron2/layers/csrc/ROIAlign/ROIAlign_cuda.cu — the op the reference's
R-CNN poolers run, configs/Base-RCNN-FPN.yaml:28-33) exactly: aligned
offsets, adaptive ceil(bin) sampling grids, border-clamped bilinear
interpolation. Tolerance 1e-4 fp32; perturbation must fail."""

import numpy as np
import pytest

from lgd_tpu.ops.roi_align import multilevel_roi_align


def roi_align_oracle(feat_hwc, roi, out, sampling_ratio=0, aligned=True,
                     stride=1.0):
    """detectron2 ROIAlign for one ROI on one level. feat: (H, W, C),
    roi xyxy in input coords."""
    H, W, C = feat_hwc.shape
    half = 0.5 if aligned else 0.0
    x1 = roi[0] / stride - half
    y1 = roi[1] / stride - half
    x2 = roi[2] / stride - half
    y2 = roi[3] / stride - half
    roi_w = max(x2 - x1, 1e-3 if aligned else 1.0)
    roi_h = max(y2 - y1, 1e-3 if aligned else 1.0)
    bin_w = roi_w / out
    bin_h = roi_h / out
    ny = sampling_ratio if sampling_ratio > 0 else int(np.ceil(bin_h))
    nx = sampling_ratio if sampling_ratio > 0 else int(np.ceil(bin_w))
    ny, nx = max(ny, 1), max(nx, 1)

    def interp(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C)
        y = min(max(y, 0.0), H - 1)
        x = min(max(x, 0.0), W - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1i, x1i = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        fy, fx = y - y0, x - x0
        return ((1 - fy) * (1 - fx) * feat_hwc[y0, x0]
                + (1 - fy) * fx * feat_hwc[y0, x1i]
                + fy * (1 - fx) * feat_hwc[y1i, x0]
                + fy * fx * feat_hwc[y1i, x1i])

    outp = np.zeros((out, out, C))
    for by in range(out):
        for bx in range(out):
            acc = np.zeros(C)
            for iy in range(ny):
                for ix in range(nx):
                    y = y1 + bin_h * by + bin_h * (iy + 0.5) / ny
                    x = x1 + bin_w * bx + bin_w * (ix + 0.5) / nx
                    acc += interp(y, x)
            outp[by, bx] = acc / (ny * nx)
    return outp


def _single_level_call(feat, rois, out, sampling_ratio, stride=1):
    """Drive multilevel_roi_align with one level so level routing is
    identity (canonical assignment clamps to the single level)."""
    B = 1
    feats = [np.asarray(feat, np.float32)[None]]
    boxes = np.asarray(rois, np.float32)[None]
    valid = np.ones((B, len(rois)), bool)
    pooled = multilevel_roi_align(
        feats, boxes, valid, [stride], out, min_level=0,
        sampling_ratio=sampling_ratio)
    return np.asarray(pooled[0])


@pytest.mark.parametrize("sampling_ratio", [0, 2])
def test_roi_align_matches_detectron2_oracle(sampling_ratio):
    rng = np.random.RandomState(0)
    H = W = 24
    C = 5
    feat = rng.randn(H, W, C).astype(np.float32)
    out = 7
    rois = np.array([
        [2.3, 3.1, 18.7, 21.2],     # interior, bin ~2.3 -> adaptive 3x3
        [0.0, 0.0, 24.0, 24.0],     # full image
        [-1.5, -2.0, 10.0, 8.0],    # spills past the top-left border
        [15.0, 14.0, 30.0, 29.0],   # spills past the bottom-right border
        [5.0, 5.0, 6.5, 6.2],       # tiny roi, bin < 1 -> 1 sample/bin
    ], np.float32)
    got = _single_level_call(feat, rois, out, sampling_ratio)
    for i, roi in enumerate(rois):
        want = roi_align_oracle(feat, roi, out, sampling_ratio)
        np.testing.assert_allclose(got[i], want, atol=1e-4, rtol=1e-4,
                                   err_msg=f"roi {i}")


def test_roi_align_adaptive_grid_differs_from_2x2():
    """The adaptive path must actually change the result for large ROIs
    (guards against silently running a fixed grid): bin size ~3.4 =>
    ceil=4 samples vs 2."""
    rng = np.random.RandomState(1)
    feat = rng.randn(32, 32, 3).astype(np.float32)
    roi = np.array([[1.0, 1.0, 25.0, 25.0]], np.float32)
    adaptive = _single_level_call(feat, roi, 7, 0)
    fixed2 = _single_level_call(feat, roi, 7, 2)
    want_adaptive = roi_align_oracle(feat, roi[0], 7, 0)
    np.testing.assert_allclose(adaptive[0], want_adaptive, atol=1e-4,
                               rtol=1e-4)
    assert np.abs(adaptive - fixed2).max() > 1e-4


def test_roi_align_perturbation_fails():
    rng = np.random.RandomState(2)
    feat = rng.randn(16, 16, 2).astype(np.float32)
    roi = np.array([2.0, 2.0, 13.0, 12.0], np.float32)
    got = _single_level_call(feat, roi[None], 7, 0)[0]
    want = roi_align_oracle(feat, roi + np.array([0.35, 0, 0, 0]), 7, 0)
    assert np.abs(got - want).max() > 1e-3


def test_multilevel_routing_matches_per_level_oracle():
    """FPN routing: each ROI pools from its canonical level with that
    level's stride."""
    rng = np.random.RandomState(3)
    strides = [8, 16, 32, 64]
    feats = [rng.randn(1, 64 // (s // 8), 80 // (s // 8), 4)
             .astype(np.float32) for s in strides]
    # level = floor(4 + log2(size/224)) -> 3,4,5,6 for these sizes
    sizes = [150.0, 300.0, 600.0, 1200.0]
    boxes = np.asarray([[10, 10, 10 + s, 10 + s] for s in sizes],
                       np.float32)[None]
    valid = np.ones((1, 4), bool)
    got = np.asarray(multilevel_roi_align(
        feats, boxes, valid, strides, 7, min_level=3, sampling_ratio=0)[0])
    lvl_for = [0, 1, 2, 3]
    for i, li in enumerate(lvl_for):
        want = roi_align_oracle(feats[li][0], boxes[0, i], 7, 0,
                                stride=strides[li])
        np.testing.assert_allclose(got[i], want, atol=1e-4, rtol=1e-4,
                                   err_msg=f"roi {i} level {li}")


def test_invalid_rois_zeroed():
    feat = np.ones((8, 8, 1), np.float32)
    boxes = np.asarray([[[0, 0, 8, 8], [0, 0, 8, 8]]], np.float32)
    valid = np.asarray([[True, False]])
    got = np.asarray(multilevel_roi_align([feat[None]], boxes, valid, [1], 2,
                                          min_level=0))
    assert got[0, 0].min() > 0.9
    assert np.all(got[0, 1] == 0)


def test_patch_impl_matches_dense_fpn():
    """impl='patch' (contiguous Gp-texel patch gather + small interpolation
    matmuls) must be exact vs impl='dense' for FPN-routed ROIs (span on the
    assigned level is bounded by the canonical-224 routing)."""
    rng = np.random.RandomState(7)
    strides = [8, 16, 32, 64]
    feats = [rng.randn(2, 80 // (s // 8), 96 // (s // 8), 8)
             .astype(np.float32) for s in strides]
    # sizes spanning all levels incl. clamped extremes + off-grid coords
    sizes = [17.0, 60.0, 150.0, 300.0, 600.0, 640.0 * 1.41]
    boxes = np.stack([
        np.asarray([[7.3, 11.9, 7.3 + s, 11.9 + s * 0.7] for s in sizes],
                   np.float32),
        np.asarray([[0.0, 0.0, s, s] for s in sizes], np.float32),
    ])
    valid = np.ones((2, 6), bool)
    for out, sr in ((7, 0), (14, 0), (7, 2)):
        a = np.asarray(multilevel_roi_align(
            feats, boxes, valid, strides, out, min_level=3,
            sampling_ratio=sr, impl="dense"))
        b = np.asarray(multilevel_roi_align(
            feats, boxes, valid, strides, out, min_level=3,
            sampling_ratio=sr, impl="patch"))
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4,
                                   err_msg=f"out={out} sr={sr}")


def test_patch_impl_matches_oracle_with_chunking():
    rng = np.random.RandomState(8)
    strides = [8, 16]
    feats = [rng.randn(1, 64 // (s // 8), 64 // (s // 8), 4)
             .astype(np.float32) for s in strides]
    P = 9  # > roi_chunk to exercise the lax.map path
    boxes = np.asarray([[10 + i, 5 + i, 80 + 3 * i, 90 + 2 * i]
                        for i in range(P)], np.float32)[None]
    valid = np.ones((1, P), bool)
    a = np.asarray(multilevel_roi_align(
        feats, boxes, valid, strides, 7, min_level=3, sampling_ratio=0,
        impl="dense", roi_chunk=4))
    b = np.asarray(multilevel_roi_align(
        feats, boxes, valid, strides, 7, min_level=3, sampling_ratio=0,
        impl="patch", roi_chunk=4))
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_pallas_impl_matches_dense_fpn():
    """impl='pallas' (per-ROI window DMA + interpolation matmul; interpret
    mode on CPU) must match impl='dense' exactly for FPN-routed ROIs, and
    its custom-vjp feature gradients must match dense's autodiff."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(9)
    strides = [8, 16, 32, 64]
    feats = [rng.randn(2, 80 // (s // 8), 96 // (s // 8), 8)
             .astype(np.float32) for s in strides]
    sizes = [17.0, 60.0, 150.0, 300.0, 600.0, 640.0 * 1.41]
    boxes = np.stack([
        np.asarray([[7.3, 11.9, 7.3 + s, 11.9 + s * 0.7] for s in sizes],
                   np.float32),
        np.asarray([[0.0, 0.0, s, s] for s in sizes], np.float32),
    ])
    valid = np.ones((2, 6), bool)
    valid[1, -1] = False
    for out, sr in ((7, 0), (7, 2)):
        a = np.asarray(multilevel_roi_align(
            feats, boxes, valid, strides, out, min_level=3,
            sampling_ratio=sr, impl="dense"))
        b = np.asarray(multilevel_roi_align(
            [jnp.asarray(f) for f in feats], boxes, valid, strides, out,
            min_level=3, sampling_ratio=sr, impl="pallas"))
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4,
                                   err_msg=f"out={out} sr={sr}")

    def loss(fs, impl):
        o = multilevel_roi_align(list(fs), boxes, valid, strides, 7,
                                 min_level=3, impl=impl)
        return jnp.sum(o * o * jnp.arange(o.size).reshape(o.shape))

    g_d = jax.grad(lambda fs: loss(fs, "dense"))(tuple(map(jnp.asarray, feats)))
    g_p = jax.grad(lambda fs: loss(fs, "pallas"))(tuple(map(jnp.asarray, feats)))
    for gd, gp in zip(g_d, g_p):
        np.testing.assert_allclose(np.asarray(gd), np.asarray(gp),
                                   atol=1e-3, rtol=1e-3)


def test_pallas_impl_grad_through_chunked_path():
    """Regression (round 5): impl='pallas' training grads with P > roi_chunk
    failed to trace — its VJP linear-transposes the dense path, and
    jax.linear_transpose over the chunked checkpoint(lax.map(...)) trips a
    JAX internals limitation (cotangents arrive as ad.ValAccum). The VJP now
    transposes the unrolled, remat-free dense formulation. Exercises the
    exact failing context: jitted value_and_grad with 130 ROIs (3 chunks)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    strides = (8, 16, 32)
    feats = tuple(jnp.asarray(rng.randn(2, 64 // (s // 8), 64 // (s // 8), 8)
                              .astype(np.float32)) for s in strides)
    P = 130
    boxes = rng.rand(2, P, 4).astype(np.float32) * 300
    boxes[..., 2:] = boxes[..., :2] + rng.rand(2, P, 2) * 200 + 4
    boxes = jnp.asarray(boxes)
    valid = jnp.asarray(rng.rand(2, P) > 0.1)

    def loss(fs, impl):
        o = multilevel_roi_align(list(fs), boxes, valid, strides, 7,
                                 min_level=3, impl=impl)
        return jnp.sum(jnp.sin(o) * o)

    (vp, gp) = jax.jit(jax.value_and_grad(
        lambda fs: loss(fs, "pallas")))(feats)
    (vd, gd) = jax.jit(jax.value_and_grad(
        lambda fs: loss(fs, "dense")))(feats)
    np.testing.assert_allclose(float(vp), float(vd), rtol=1e-5)
    for a, b in zip(gp, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)
