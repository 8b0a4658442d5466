"""ROIAlign (V2/aligned) on TPU — gather-based bilinear sampling.

TPU-native equivalent of detectron2's ROIAlign CUDA kernel (reference
dependency; used by R-CNN box/mask pooling, configs/Base-RCNN-FPN.yaml:28-33;
SURVEY.md §2.3), shape-static by design:

- sampling_ratio: detectron2's ``sampling_ratio=0`` takes an adaptive
  ``ceil(bin_h) x ceil(bin_w)`` sample grid per ROI (per-axis). That count is
  data-dependent, so here every ROI samples a static ``s_max x s_max`` grid
  whose *positions and weights* depend on the ROI's adaptive count: sample j
  sits at ``(j + 0.5)/n`` of the bin with weight ``1/(ny*nx)`` for ``j < n``
  and weight 0 otherwise — bit-identical to the CUDA op whenever
  ``ceil(bin) <= s_max`` (always true for FPN-routed ROIs: the level
  assignment bounds bin size to < 4 for the canonical 224/stride scheme),
  and a uniform s_max-point average beyond (quantified in
  tests/test_roi_align_golden.py).
- multilevel pooling: rather than routing each ROI to one pyramid level with
  ragged batching, all levels are flattened and concatenated along a single
  "pixel" axis; each ROI's gather indices carry its level offset, so the
  whole padded ROI batch is pooled by ONE batched gather + interpolation —
  MXU/VPU-friendly, no per-level loops.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _roi_sample_geometry(boxes, box_valid, strides, hw, out, min_level,
                         aligned, sampling_ratio, S):
    """Per-ROI level routing + bilinear corner indices/weights (shared by
    every impl). Returns (levels, Hl, Wl, (y0i, wy0, y1i, wy1),
    (x0i, wx0, x1i, wx1)) with corner arrays shaped (B, P, out*S)."""
    L = len(hw)
    levels = assign_fpn_levels(boxes, min_level, min_level + L - 1) - min_level
    levels = jnp.where(box_valid, levels, 0)

    stride_tab = jnp.asarray(strides, jnp.float32)
    h_tab = jnp.asarray([h for h, w in hw], jnp.int32)
    w_tab = jnp.asarray([w for h, w in hw], jnp.int32)
    stride = stride_tab[levels]            # (B, P)
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

    if sampling_ratio > 0:
        ny = jnp.full_like(bin_h, float(S))
        nx = jnp.full_like(bin_w, float(S))
    else:
        # detectron2 ROIAlign CUDA: roi_bin_grid = ceil(roi_size/out), >= 1
        ny = jnp.clip(jnp.ceil(bin_h), 1.0, float(S))
        nx = jnp.clip(jnp.ceil(bin_w), 1.0, float(S))

    # sample positions: bin index + (j + 0.5)/n within the bin, per ROI
    bin_idx = jnp.asarray(np.repeat(np.arange(out), S), jnp.float32)  # (out*S,)
    slot_idx = jnp.asarray(np.tile(np.arange(S), out), jnp.float32)
    gy = bin_idx + (slot_idx + 0.5) / ny[..., None]     # (B, P, out*S)
    gx = bin_idx + (slot_idx + 0.5) / nx[..., None]
    sy = y1[..., None] + bin_h[..., None] * gy
    sx = x1[..., None] + bin_w[..., None] * gx
    # slot j participates iff j < n (weight 1/n); dead slots weigh 0
    wy_slot = jnp.where(slot_idx < ny[..., None], 1.0 / ny[..., None], 0.0)
    wx_slot = jnp.where(slot_idx < nx[..., None], 1.0 / nx[..., None], 0.0)

    def bilinear_axis(coord, size):
        # detectron2 bilinear_interpolate semantics: a sample outside
        # [-1, size] contributes 0; otherwise the coordinate clamps into
        # [0, size-1] (border rows/cols get full weight at the edges)
        sizef = size[..., None].astype(coord.dtype)
        valid = (coord >= -1.0) & (coord <= sizef)
        c = jnp.clip(coord, 0.0, sizef - 1.0)
        c0 = jnp.floor(c)
        frac = c - c0
        c0i = c0.astype(jnp.int32)
        c1i = jnp.minimum(c0i + 1, size[..., None] - 1)
        return (c0i, (1 - frac) * valid), (c1i, frac * valid)

    (y0i, wy0), (y1i, wy1) = bilinear_axis(sy, Hl)
    (x0i, wx0), (x1i, wx1) = bilinear_axis(sx, Wl)
    # fold the per-slot adaptive weight into the bilinear weights once
    wy0, wy1 = wy0 * wy_slot, wy1 * wy_slot
    wx0, wx1 = wx0 * wx_slot, wx1 * wx_slot
    return levels, Hl, Wl, (y0i, wy0, y1i, wy1), (x0i, wx0, x1i, wx1)


def multilevel_roi_align(
    features: List[jax.Array],
    boxes: jax.Array,
    box_valid: jax.Array,
    strides: Sequence[int],
    output_size: int,
    min_level: int,
    aligned: bool = True,
    sampling_ratio: int = 0,
    s_max: int = 4,
    roi_chunk: int = 64,
    impl: str = "dense",
    patch_size: int = 32,
    unroll: bool = False,
    chunk_remat: bool = True,
) -> jax.Array:
    """features: per-level (B, Hi, Wi, C) list; boxes: (B, P, 4) in input
    coords; box_valid: (B, P). Returns (B, P, out, out, C).

    sampling_ratio > 0: fixed grid of that many samples per bin axis
    (detectron2 semantics). sampling_ratio == 0: adaptive ceil(bin) grid,
    realized statically as an s_max-slot masked grid (see module docstring).

    roi_chunk bounds peak memory: the 4 bilinear corner gathers materialize
    (B, chunk, out*S, out*S, C) workspaces, so pooling sweeps the ROI axis
    in lax.map chunks (512 ROIs x 14x14 x 256ch would otherwise peak at
    many GB and OOM a 16 GB chip mid-train-step).
    """
    B, P0, _ = boxes.shape
    C = features[0].shape[-1]
    L = len(features)
    out = output_size
    if L == 1 and sampling_ratio == 0 and s_max < 8:
        # single-level (C4/Res5ROIHeads, stride-16) pooling has no FPN level
        # routing to bound bin sizes: a ~1300 px ROI needs ceil(bin)=6
        # samples/axis where the FPN cap of 4 would silently degrade to
        # uniform sampling. 8 slots cover ROIs up to ~1790 px at stride 16
        # with out=14 (larger ones still clip — README deviations).
        s_max = 8
    if L == 1 and impl in ("patch", "pallas", "auto"):
        # C4 ROIs are not span-bounded by level routing; a fixed texel
        # window cannot cover them. Use the exact full-width dense matmuls.
        impl = "dense"
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "dense"
    if impl == "pallas":
        return _roi_align_pallas(tuple(features), boxes, box_valid,
                                 tuple(int(s) for s in strides), out,
                                 min_level, aligned, sampling_ratio, s_max)
    S = sampling_ratio if sampling_ratio > 0 else s_max

    if roi_chunk and P0 > roi_chunk:
        pad = (-P0) % roi_chunk
        if pad:
            boxes = jnp.concatenate(
                [boxes, jnp.zeros((B, pad, 4), boxes.dtype)], axis=1)
            box_valid = jnp.concatenate(
                [box_valid, jnp.zeros((B, pad), bool)], axis=1)
        nc = boxes.shape[1] // roi_chunk
        boxes_c = boxes.reshape(B, nc, roi_chunk, 4).transpose(1, 0, 2, 3)
        valid_c = box_valid.reshape(B, nc, roi_chunk).transpose(1, 0, 2)
        # jax.checkpoint: lax.map's backward otherwise stacks every chunk's
        # einsum/gather residuals; recomputing the cheap pooling forward
        # keeps only the chunk inputs live. chunk_remat=False drops the
        # wrapper for jax.linear_transpose callers (the Pallas VJP): a
        # linear function's transpose has no residuals to save, and
        # linear_transpose over checkpoint(map(...)) trips a JAX internals
        # limitation (cotangents arrive as ad.ValAccum accumulators).
        body = (lambda args: multilevel_roi_align(
            features, args[0], args[1], strides, output_size,
            min_level, aligned, sampling_ratio, s_max, roi_chunk=0,
            impl=impl, patch_size=patch_size))
        if chunk_remat:
            body = jax.checkpoint(body)
        if unroll:
            # static chunk slices; XLA schedules/overlaps chunk chains
            # instead of a serial while loop of dynamic slices
            pooled = jnp.stack([body((boxes_c[i], valid_c[i]))
                                for i in range(nc)])
        else:
            pooled = jax.lax.map(body, (boxes_c, valid_c))
        # (nc, B, chunk, out, out, C)
        pooled = pooled.transpose(1, 0, 2, 3, 4, 5).reshape(
            B, nc * roi_chunk, out, out, C)
        return pooled[:, :P0]
    P = P0

    # flatten + concat levels along the pixel axis
    flat = [f.reshape(B, -1, C) for f in features]
    level_sizes = [f.shape[1] * f.shape[2] for f in features]
    level_offsets = np.concatenate([[0], np.cumsum(level_sizes)])[:-1]
    hw = [(f.shape[1], f.shape[2]) for f in features]
    all_flat = jnp.concatenate(flat, axis=1)  # (B, sum(HiWi), C)

    off_tab = jnp.asarray(level_offsets, jnp.int32)
    geo = _roi_sample_geometry(boxes, box_valid, strides, hw, out, min_level,
                               aligned, sampling_ratio, S)
    (levels, Hl, Wl, (y0i, wy0, y1i, wy1), (x0i, wx0, x1i, wx1)) = geo
    base_off = off_tab[levels]

    if impl == "dense":
        # ---- pure-MXU path: ROIAlign as interpolation matmuls. Per level,
        # fold bilinear + adaptive-slot + bin-average weights into full-
        # width matrices AyF (B, P, out, Hl) / AxF (B, P, out, Wl) and
        # contract pooled = AyF @ F @ AxF^T. Forward AND backward are plain
        # dense matmuls (the gather paths' backward lowers to scatter-add,
        # measured 500+ ms per R-CNN step; this is ~0.5 TFLOP of bf16
        # matmul ≈ a few ms). Exact for every ROI size; ROIs off a level
        # carry zero rows there.
        pooled = jnp.zeros((B, P, out, out, C), jnp.float32)
        for li, f in enumerate(features):
            Hl_i, Wl_i = f.shape[1], f.shape[2]
            on = (levels == li).astype(jnp.float32)

            def axis_mat(c0i, w0, c1i, w1, size):
                grid = jnp.arange(size, dtype=jnp.int32)
                a = (w0[..., None] * (grid == c0i[..., None])
                     + w1[..., None] * (grid == c1i[..., None]))
                return a.reshape(B, P, out, S, size).sum(3)

            ay = axis_mat(y0i, wy0, y1i, wy1, Hl_i) * on[..., None, None]
            ax = axis_mat(x0i, wx0, x1i, wx1, Wl_i)
            wdt = f.dtype
            t = jnp.einsum("bpiy,byxc->bpixc", ay.astype(wdt), f,
                           preferred_element_type=jnp.float32)
            pooled = pooled + jnp.einsum(
                "bpixc,bpjx->bpijc", t.astype(wdt), ax.astype(wdt),
                preferred_element_type=jnp.float32)
        pooled = pooled.astype(features[0].dtype)
        return pooled * box_valid[..., None, None, None].astype(pooled.dtype)

    if impl == "patch":
        # ---- MXU path: one contiguous patch gather per ROI + two small
        # interpolation matmuls (resize-as-matmul). The per-sample corner
        # gathers above fetch ~4x redundant texels through random 512 B
        # reads (measured 200+ ms per R-CNN step); instead gather each
        # ROI's (Gp, Gp) level-aligned patch with contiguous row slices and
        # contract pooled = Ay @ patch @ Ax^T, where Ay/Ax fold bilinear,
        # adaptive-slot and bin-average weights into (out, Gp) matrices.
        # Exact whenever the ROI spans <= Gp texels on its level (always
        # true for FPN-routed ROIs with the canonical 224 scheme); larger
        # clamped-level ROIs clip to the patch edge (documented approx).
        # Gp needs no per-level cap: patches are Gp consecutive FLAT pixels
        # per row (levels narrower than Gp wrap into the next row, but
        # those columns are never referenced by Ax — corner x-indices stay
        # < Wl — so they carry zero weight)
        Gp = patch_size
        o_y = y0i[..., 0]   # slot 0 of bin 0 is always live -> min corner
        o_x = x0i[..., 0]

        def interp_matrix(c0i, w0, c1i, w1, origin):
            # (B, P, out*S) corner indices/weights -> (B, P, out, Gp)
            r0 = jnp.clip(c0i - origin[..., None], 0, Gp - 1)
            r1 = jnp.clip(c1i - origin[..., None], 0, Gp - 1)
            grid = jnp.arange(Gp, dtype=jnp.int32)
            a = (w0[..., None] * (grid == r0[..., None])
                 + w1[..., None] * (grid == r1[..., None]))
            return a.reshape(*a.shape[:2], out, S, Gp).sum(3)

        Ay = interp_matrix(y0i, wy0, y1i, wy1, o_y)   # (B, P, out, Gp)
        Ax = interp_matrix(x0i, wx0, x1i, wx1, o_x)

        # contiguous row-slice gather from the (zero-padded) flat pixels
        NPad = all_flat.shape[1] + Gp
        flat_padded = jnp.concatenate(
            [all_flat, jnp.zeros((B, Gp, C), all_flat.dtype)], axis=1)
        rows = o_y[..., None] + jnp.arange(Gp, dtype=jnp.int32)  # (B, P, Gp)
        starts = (base_off[..., None] + rows * Wl[..., None]
                  + o_x[..., None])
        # rows past the ROI's level are zero-weighted in Ay; clamp their
        # start so the slice stays in bounds
        starts = jnp.minimum(starts, NPad - Gp).reshape(B, P * Gp, 1)

        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,))

        def gather_img(flat_i, starts_i):
            return jax.lax.gather(
                flat_i, starts_i, dnums, slice_sizes=(Gp, C),
                mode="clip")

        patch = jax.vmap(gather_img)(flat_padded, starts)
        patch = patch.reshape(B, P, Gp, Gp, C)

        wdt = all_flat.dtype
        t = jnp.einsum("bpiy,bpyxc->bpixc", Ay.astype(wdt), patch,
                       preferred_element_type=jnp.float32)
        pooled = jnp.einsum("bpixc,bpjx->bpijc", t.astype(wdt),
                            Ax.astype(wdt),
                            preferred_element_type=jnp.float32
                            ).astype(all_flat.dtype)
        return pooled * box_valid[..., None, None, None].astype(pooled.dtype)

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
    )  # (B, P, n, n, C) — each sample pre-scaled by 1/(ny*nx)

    # sum S x S weighted samples per bin (weights already sum to 1 per bin)
    samples = samples.reshape(B, P, out, S, out, S, C)
    pooled = samples.sum(axis=(3, 5))
    return pooled * box_valid[..., None, None, None].astype(pooled.dtype)


# ---------------------------------------------------------------------------
# Pallas forward: per-ROI window DMA + one interpolation matmul
# ---------------------------------------------------------------------------

@functools.lru_cache(None)
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform.lower() in ("tpu", "axon")
    except Exception:  # noqa: BLE001
        return False


def _window_size(hw) -> int:
    """Texel window covering every routed ROI: mid levels are span-bounded
    by the canonical-224 routing (< 30 texels); clamped top-level ROIs span
    up to the whole top level (+ bilinear slack)."""
    top_h, top_w = hw[-1]
    need = max(32, max(top_h, top_w) + 4)
    return (need + 7) // 8 * 8


def _roi_window_matrices(geo, hw_pad, Gpy, Gpx, out, S, box_valid):
    """Fold bilinear + adaptive-slot weights into one (out^2, Gpy*Gpx)
    window-relative interpolation matrix per ROI. Returns (W (B*P, out^2,
    Gpy*Gpx), oy (B, P), ox (B, P)) with origins clamped so the window
    stays inside the (padded) level; referenced texels always lie inside
    the window for routed ROIs (clamping only relocates zero-weight
    slots). The x origin is additionally rounded DOWN to a multiple of 8:
    Mosaic requires the dynamic HBM-slice offset on the second-minor
    (sublane-tiled) axis to be 8-aligned, and the x window is 8 wider than
    the y window (Gpx = Gpy + 8) so alignment never loses coverage."""
    levels, Hl, Wl, ygeo, xgeo = geo
    y0i, wy0, y1i, wy1 = ygeo
    x0i, wx0, x1i, wx1 = xgeo
    hp_tab = jnp.asarray([h for h, w in hw_pad], jnp.int32)
    wp_tab = jnp.asarray([w for h, w in hw_pad], jnp.int32)
    oy = jnp.clip(y0i[..., 0], 0, hp_tab[levels] - Gpy)
    # clamp against the coverage bound first (window [ox, ox+Gpy) covers
    # every routed texel), THEN align; [ox_a, ox_a+Gpx) still covers and
    # stays inside the padded level (wp is padded past Wl by >= 8)
    ox = jnp.clip(x0i[..., 0], 0, wp_tab[levels] - Gpx)
    ox = (ox // 8) * 8

    def mat(c0i, w0, c1i, w1, origin, G):
        r0 = jnp.clip(c0i - origin[..., None], 0, G - 1)
        r1 = jnp.clip(c1i - origin[..., None], 0, G - 1)
        grid = jnp.arange(G, dtype=jnp.int32)
        a = (w0[..., None] * (grid == r0[..., None])
             + w1[..., None] * (grid == r1[..., None]))
        return a.reshape(*a.shape[:2], out, S, G).sum(3)  # (B, P, out, G)

    ay = mat(y0i, wy0, y1i, wy1, oy, Gpy) * box_valid[..., None, None]
    ax = mat(x0i, wx0, x1i, wx1, ox, Gpx)
    w = jnp.einsum("bpiy,bpjx->bpijyx", ay, ax)
    B, P = levels.shape
    return w.reshape(B * P, out * out, Gpy * Gpx), oy, ox


def _roi_fwd_kernel(lev_ref, b_ref, oy_ref, ox_ref, *refs, L, Gpy, Gpx, C):
    feat_refs = refs[:L]
    w_ref, out_ref, patch, sem = refs[L], refs[L + 1], refs[L + 2], refs[L + 3]
    i = pl.program_id(0)
    lv, b = lev_ref[i], b_ref[i]
    # ox_ref carries ox // 8: multiplying by 8 IN-KERNEL lets Mosaic prove
    # the sublane-tiled dim-2 slice offset is 8-aligned (a bare prefetched
    # scalar has unknown divisibility and fails to compile)
    oy, ox = oy_ref[i], ox_ref[i] * 8
    for li in range(L):
        @pl.when(lv == li)
        def _(li=li):
            dma = pltpu.make_async_copy(
                feat_refs[li].at[b, pl.ds(oy, Gpy), pl.ds(ox, Gpx), :],
                patch, sem)
            dma.start()
            dma.wait()
    p = patch[...].reshape(Gpy * Gpx, C)
    out_ref[0] = jax.lax.dot_general(
        w_ref[0], p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _roi_pallas_fwd(features, boxes, box_valid, strides, out, min_level,
                    aligned, sampling_ratio, s_max):
    B, P, _ = boxes.shape
    C = features[0].shape[-1]
    L = len(features)
    hw = [(f.shape[1], f.shape[2]) for f in features]
    S = sampling_ratio if sampling_ratio > 0 else s_max
    Gpy = _window_size(hw)
    # x window: origin is 8-aligned for Mosaic's sublane-tiled dynamic HBM
    # slice, so it is 8 wider than the coverage bound (_roi_window_matrices)
    Gpx = Gpy + 8

    geo = _roi_sample_geometry(boxes, box_valid, strides, hw, out, min_level,
                               aligned, sampling_ratio, S)
    hw_pad = [(max(h, Gpy), -(-max(w, Gpx) // 8) * 8) for h, w in hw]
    w, oy, ox = _roi_window_matrices(geo, hw_pad, Gpy, Gpx, out, S, box_valid)
    dtype = features[0].dtype
    w = w.astype(dtype)

    feats_pad = [
        jnp.pad(f, ((0, 0), (0, hp - h), (0, wp - wd), (0, 0)))
        if (hp > h or wp > wd) else f
        for f, (h, wd), (hp, wp) in zip(features, hw, hw_pad)
    ]
    levels = geo[0]
    b_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None],
                             (B, P)).reshape(-1)
    out2 = out * out

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B * P,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * L + [
            pl.BlockSpec((1, out2, Gpy * Gpx), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, out2, C), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Gpy, Gpx, C), dtype),
                        pltpu.SemaphoreType.DMA],
    )
    pooled = pl.pallas_call(
        functools.partial(_roi_fwd_kernel, L=L, Gpy=Gpy, Gpx=Gpx, C=C),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * P, out2, C), dtype),
        interpret=not _on_tpu(),
    )(levels.reshape(-1).astype(jnp.int32), b_idx,
      oy.reshape(-1).astype(jnp.int32),
      (ox // 8).reshape(-1).astype(jnp.int32),
      *feats_pad, w)
    return pooled.reshape(B, P, out, out, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _roi_align_pallas(features, boxes, box_valid, strides, output_size,
                      min_level, aligned, sampling_ratio, s_max):
    """Pallas forward (per-ROI window DMA + matmul; ~0.4 MB of HBM traffic
    per ROI instead of a full-width (B, P, out, Wl, C) intermediate) with
    the exact dense-matmul transpose as the backward (features enter the
    pooling linearly; proposal boxes are stop-gradient upstream,
    rcnn.py:121, matching detectron2's detached proposals)."""
    return _roi_pallas_fwd(features, boxes, box_valid, strides, output_size,
                           min_level, aligned, sampling_ratio, s_max)


def _roi_pallas_vjp_fwd(features, boxes, box_valid, strides, output_size,
                        min_level, aligned, sampling_ratio, s_max):
    out = _roi_pallas_fwd(features, boxes, box_valid, strides, output_size,
                          min_level, aligned, sampling_ratio, s_max)
    structs = tuple(jax.eval_shape(lambda x: x, f) for f in features)
    return out, (structs, boxes, box_valid)


def _roi_pallas_vjp_bwd(strides, output_size, min_level, aligned,
                        sampling_ratio, s_max, res, g):
    structs, boxes, box_valid = res

    def lin(feats):
        # unroll + no remat: jax.linear_transpose over lax.map (and over
        # checkpoint-of-map) trips a JAX internals limitation in this
        # version (cotangents arrive as ad.ValAccum accumulators), and a
        # linear transpose has no residuals for checkpoint to save anyway.
        # Static chunk slices also let XLA overlap the transposed chunk
        # chains instead of a serial while loop.
        return multilevel_roi_align(
            list(feats), boxes, box_valid, strides, output_size, min_level,
            aligned, sampling_ratio, s_max, roi_chunk=64, impl="dense",
            unroll=True, chunk_remat=False)

    dfeats = jax.linear_transpose(lin, structs)(g)[0]
    dvalid = np.zeros(box_valid.shape, jax.dtypes.float0)
    return tuple(dfeats), jnp.zeros_like(boxes), dvalid


_roi_align_pallas.defvjp(_roi_pallas_vjp_fwd, _roi_pallas_vjp_bwd)
