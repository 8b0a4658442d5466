"""ROIAlign (V2/aligned) on TPU — gather-based bilinear sampling.

TPU-native equivalent of detectron2's ROIAlign CUDA kernel (reference
dependency; used by R-CNN box/mask pooling, configs/Base-RCNN-FPN.yaml:28-33;
SURVEY.md §2.3). Two deltas from the CUDA op, both shape-static by design:

- sampling_ratio: detectron2's adaptive ceil(roi_h/out_h) points per bin is
  data-dependent; here a fixed 2x2 sample grid per bin is used (the value
  detectron2 effectively uses for typical ROI/bin ratios).
- multilevel pooling: rather than routing each ROI to one pyramid level with
  ragged batching, all levels are flattened and concatenated along a single
  "pixel" axis; each ROI's gather indices carry its level offset, so the
  whole padded ROI batch is pooled by ONE batched gather + interpolation —
  MXU/VPU-friendly, no per-level loops.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def assign_fpn_levels(boxes, min_level: int, max_level: int,
                      canonical_size: float = 224.0,
                      canonical_level: int = 4):
    """detectron2 assign_boxes_to_levels: level = floor(canon + log2(
    sqrt(area)/224)), clamped. boxes: (..., 4) -> (...,) int32."""
    area = jnp.clip((boxes[..., 2] - boxes[..., 0])
                    * (boxes[..., 3] - boxes[..., 1]), 1e-6)
    lvl = jnp.floor(canonical_level + jnp.log2(jnp.sqrt(area) / canonical_size
                                               + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def multilevel_roi_align(
    features: List[jax.Array],
    boxes: jax.Array,
    box_valid: jax.Array,
    strides: Sequence[int],
    output_size: int,
    min_level: int,
    aligned: bool = True,
) -> jax.Array:
    """features: per-level (B, Hi, Wi, C) list; boxes: (B, P, 4) in input
    coords; box_valid: (B, P). Returns (B, P, out, out, C)."""
    B, P, _ = boxes.shape
    C = features[0].shape[-1]
    L = len(features)
    out = output_size
    S = 2  # samples per bin axis

    # flatten + concat levels along the pixel axis
    flat = [f.reshape(B, -1, C) for f in features]
    level_sizes = [f.shape[1] * f.shape[2] for f in features]
    level_offsets = np.concatenate([[0], np.cumsum(level_sizes)])[:-1]
    hw = [(f.shape[1], f.shape[2]) for f in features]
    all_flat = jnp.concatenate(flat, axis=1)  # (B, sum(HiWi), C)

    levels = assign_fpn_levels(boxes, min_level, min_level + L - 1) - min_level
    levels = jnp.where(box_valid, levels, 0)

    # per-roi static level constants gathered from numpy tables
    stride_tab = jnp.asarray(strides, jnp.float32)
    off_tab = jnp.asarray(level_offsets, jnp.int32)
    h_tab = jnp.asarray([h for h, w in hw], jnp.int32)
    w_tab = jnp.asarray([w for h, w in hw], jnp.int32)

    stride = stride_tab[levels]            # (B, P)
    base_off = off_tab[levels]
    Hl = h_tab[levels]
    Wl = w_tab[levels]

    half = 0.5 if aligned else 0.0
    x1 = boxes[..., 0] / stride - half
    y1 = boxes[..., 1] / stride - half
    x2 = boxes[..., 2] / stride - half
    y2 = boxes[..., 3] / stride - half
    roi_w = jnp.maximum(x2 - x1, 1e-3 if aligned else 1.0)
    roi_h = jnp.maximum(y2 - y1, 1e-3 if aligned else 1.0)
    bin_w = roi_w / out
    bin_h = roi_h / out

    # sample positions: (out*S,) relative offsets per axis
    g = (jnp.arange(out * S, dtype=jnp.float32) + 0.5) / S  # in bin units
    sy = y1[..., None] + bin_h[..., None] * g  # (B, P, out*S)
    sx = x1[..., None] + bin_w[..., None] * g

    def bilinear_axis(coord, size):
        c0 = jnp.floor(coord)
        frac = coord - c0
        c0i = c0.astype(jnp.int32)
        c1i = c0i + 1
        v0 = (c0i >= 0) & (c0i < size[..., None])
        v1 = (c1i >= 0) & (c1i < size[..., None])
        c0i = jnp.clip(c0i, 0, size[..., None] - 1)
        c1i = jnp.clip(c1i, 0, size[..., None] - 1)
        return (c0i, (1 - frac) * v0), (c1i, frac * v1)

    (y0i, wy0), (y1i, wy1) = bilinear_axis(sy, Hl)
    (x0i, wx0), (x1i, wx1) = bilinear_axis(sx, Wl)

    n = out * S

    def gather(yi, xi):
        # (B, P, n, n) flattened indices into all_flat's pixel axis
        idx = (base_off[..., None, None] + yi[..., :, None] * Wl[..., None, None]
               + xi[..., None, :])
        idx = idx.reshape(B, P * n * n)
        g = jnp.take_along_axis(all_flat, idx[..., None], axis=1)
        return g.reshape(B, P, n, n, C)

    w00 = (wy0[..., :, None] * wx0[..., None, :])[..., None]
    w01 = (wy0[..., :, None] * wx1[..., None, :])[..., None]
    w10 = (wy1[..., :, None] * wx0[..., None, :])[..., None]
    w11 = (wy1[..., :, None] * wx1[..., None, :])[..., None]
    samples = (
        gather(y0i, x0i) * w00 + gather(y0i, x1i) * w01
        + gather(y1i, x0i) * w10 + gather(y1i, x1i) * w11
    )  # (B, P, n, n, C)

    # average S x S samples per bin
    samples = samples.reshape(B, P, out, S, out, S, C)
    pooled = samples.mean(axis=(3, 5))
    return pooled * box_valid[..., None, None, None].astype(pooled.dtype)
