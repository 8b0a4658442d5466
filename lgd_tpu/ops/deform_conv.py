"""Modulated deformable convolution (DCNv2) for TPU.

TPU-native equivalent of detectron2's ``deform_conv.cu`` CUDA kernel
(reference dependency; enabled by MODEL.RESNETS.DEFORM_ON_PER_STAGE /
DEFORM_MODULATED in the *_dcnv2_* configs — SURVEY.md §2.3).

Two implementations:

``impl='dense'`` (default) — bilinear sampling as dense one-hot MATMULS,
no gather/scatter anywhere. Every bilinear sample factorizes into the outer
product of two 2-hot vectors: one over a Dy-row window around the output
row (``Ay``), one over the row width (``Ax``). Sampling is then, per output
row, ``out[s,c] = sum_dy Ay[s,dy] * (Ax[s,:] @ rows_dy)``: a batched
(S x W)@(W x C) MXU matmul per window row. Cost is B*Ho*Wo*K*Dy*W*C FLOPs
(~38 GFLOP per res4 layer at 640^2, Dy=16) — a few ms — where the gather
formulation measured 6.6 ms *forward* and its backward lowers to
scatter-add (measured 8+ ms; 477 ms for block scatter): XLA:TPU emits
serial per-index DMAs (~57 ns each), so 115k samples/layer were issue-rate
bound. Forward AND backward here are plain dense matmuls and static
shifted adds.

On WIDE feature maps a full-row ``Ax`` makes the sampling contraction
dominate the conv itself (res3 at 640^2: Dy*W = 1280-deep, ~10x the 3x3
conv's FLOPs), so for W >= 2*((wc-1)*stride + Dx) the x axis is ALSO
windowed (``x_window='auto'``): output columns are processed in chunks of
``wc`` whose shared window spans ``(wc-1)*stride + Dx`` input columns —
the contraction drops to Dy*Dxw (1280 -> 496 at res3) with the exact same
clamp semantics as y.

Numerics vs the CUDA kernel: exact in x for arbitrary offsets when
``x_window`` is off (Ax spans the whole row; out-of-image corners carry
zero weight, matching dmcn_im2col_bilinear's per-corner validity); with
the x window active, x matches y's contract below. Exact in y whenever
``floor(ky*dil + dy_off)`` lies within the Dy-row window around the output
row (|dy_off| <= (Dy-2)/2 - dil; Dy=16 -> +-6 feature px; interior columns
of an x chunk get extra margin). Samples farther away clamp to the window
edge row/column pair unless the true rows/cols are outside the image, in
which case they are exactly zero. Offsets are zero-initialized and small
in trained detectors; the deviation is documented in README, and
TPU.DCN_IMPL='auto' routes eval to the exact gather path.

``impl='pallas'`` — same math as 'dense', fused: a Pallas kernel builds the
joint interpolation matrix A = Ay (x) Ax *in VMEM* per output row and
contracts it against the in-VMEM input window, so neither A (the dominant
HBM cost of the dense path: ~150 MB/layer at res4) nor the Dy-replicated
row strips ever exist in HBM. Forward only; the backward is the dense
path's exact VJP (recomputed, mirroring the ROIAlign staging) so gradients
are bit-identical to ``impl='dense'``.

``impl='gather'`` — the original 4-corner gather path, kept as the parity
oracle for the dense path and for very-large-offset exactness.

Offset channel layout matches detectron2: per kernel tap k, channels
(2k, 2k+1) = (dy_k, dx_k); modulation mask has one channel per tap and is
already sigmoid-activated by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_bhwc(x_flat, idx, H, W, valid):
    """x_flat: (B, H*W, C); idx: (B, P) int32 flattened y*W+x; valid: (B, P)
    -> (B, P, C) with zeros where invalid."""
    g = jnp.take_along_axis(x_flat, idx[..., None], axis=1)
    return g * valid[..., None].astype(g.dtype)


def deform_conv2d_params(
    x,
    weight,
    offsets,
    mask=None,
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    dtype=jnp.bfloat16,
    impl: str = "dense",
    y_window: int = 16,
    x_window="auto",
    x_chunk: int = 16,
):
    """Modulated deformable conv.

    Args:
        x: (B, H, W, C) input.
        weight: (kh, kw, C // groups, F).
        offsets: (B, Ho, Wo, 2*kh*kw) float32 (dy, dx per tap).
        mask: optional (B, Ho, Wo, kh*kw) modulation in [0, 1].
        stride/dilation: ints (padding is fixed to 'SAME'-style dilation*k//2
            as used by the ResNet 3x3).
        impl: 'dense' (one-hot matmuls, default) or 'gather'.
        y_window: dense path's row-window size Dy (y-offsets exact within
            +-((Dy-2)/2 - dilation) feature px).
        x_window: dense path's column-window size Dx, or None for an exact
            full-row Ax, or 'auto' (window iff the map is wide enough that
            windowing at least halves the contraction depth).
        x_chunk: output columns per shared x window (wc above).
    Returns:
        (B, Ho, Wo, F)
    """
    B, H, W, C = x.shape
    kh, kw, _, F = weight.shape
    K = kh * kw
    pad = dilation * (kh // 2)

    Ho = (H + 2 * pad - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * pad - dilation * (kw - 1) - 1) // stride + 1

    # base sampling grid per output position and tap: (Ho, Wo, K)
    oy = np.arange(Ho) * stride - pad
    ox = np.arange(Wo) * stride - pad
    ky, kx = np.meshgrid(np.arange(kh) * dilation, np.arange(kw) * dilation,
                         indexing="ij")
    base_y = oy[:, None, None] + ky.reshape(-1)[None, None, :]  # (Ho,1,K)
    base_x = ox[None, :, None] + kx.reshape(-1)[None, None, :]  # (1,Wo,K)
    base_y = jnp.asarray(np.broadcast_to(base_y, (Ho, Wo, K)), jnp.float32)
    base_x = jnp.asarray(np.broadcast_to(base_x, (Ho, Wo, K)), jnp.float32)

    if impl in ("dense", "pallas"):
        if x_window == "auto":
            x_window = (int(y_window)
                        if W >= 2 * ((x_chunk - 1) * stride + int(y_window))
                        else None)
        kw_ = dict(stride=stride, pad=pad, Dy=int(y_window),
                   kh=kh, dilation=dilation, Ho=Ho, Wo=Wo, K=K,
                   Dx=None if x_window is None else int(x_window),
                   wc=int(x_chunk))
        if impl == "pallas":
            sampled = _sample_pallas(x, offsets, mask, **kw_)
        else:
            sampled = _sample_dense(x, offsets, mask, base_x, **kw_)
    else:
        sampled = _sample_gather(x, offsets, mask, base_y, base_x,
                                 Ho=Ho, Wo=Wo, K=K, dtype=dtype)

    sampled = sampled.astype(dtype)
    w = weight.astype(dtype)
    if groups == 1:
        out = jnp.einsum(
            "bpkc,kcf->bpf",
            sampled,
            w.reshape(K, C, F),
            preferred_element_type=jnp.float32,
        )
    else:
        Cg = C // groups
        Fg = F // groups
        sampled = sampled.reshape(B, Ho * Wo, K, groups, Cg)
        wg = w.reshape(K, Cg, groups, Fg)
        out = jnp.einsum(
            "bpkgc,kcgf->bpgf",
            sampled,
            wg,
            preferred_element_type=jnp.float32,
        ).reshape(B, Ho * Wo, F)
    return out.reshape(B, Ho, Wo, F).astype(dtype)


def _sample_dense(x, offsets, mask, base_x, *, stride, pad, Dy, kh, dilation,
                  Ho, Wo, K, Dx=None, wc=16):
    """Bilinear sampling as one joint one-hot MATMUL per row chunk (module
    docstring). Per output row the (S, Dy*W) interpolation matrix
    A = Ay (x) Ax contracts against the (Dy*W, C) row strip — contraction
    depth Dy*W (512-1280) keeps the MXU full (the per-dy loop variant with
    depth W=40 measured 7 ms fwd; this measures 0.04 ms at res4 scale).
    With ``Dx`` set, output columns are additionally processed in chunks of
    ``wc`` sharing a (wc-1)*stride + Dx column window, dropping the depth
    to Dy*Dxw on wide maps (module docstring). Output rows are processed in
    chunks bounding the materialized A to a few hundred MB; jax.checkpoint
    recomputes the builds+matmul in the backward instead of keeping
    per-chunk residuals."""
    B, H, W, C = x.shape
    S = Wo * K
    # window of Dy input rows per output row, centred on the middle tap:
    # window slot dy covers absolute input row  yo*stride + lo + dy
    lo = pad - (Dy - 2) // 2

    # tap row offsets relative to the output anchor (static, (K,))
    ky = jnp.asarray(np.repeat(np.arange(kh) * dilation, kh), jnp.float32)

    top = -lo + pad  # zero-padding above row 0 (lo < 0 for Dy >= 4)
    last = (Ho - 1) * stride + lo + Dy - 1 - pad
    bot = max(0, last - (H - 1))

    if Dx is None:
        col_chunks = None
        leftx = botx = 0
        depth = Dy * W
    else:
        # column chunk j's window covers absolute input cols starting at
        # w0*stride - leftx, i.e. x-padded col w0*stride (mirrors y)
        leftx = (Dx - 2) // 2
        col_chunks = [(w0, min(wc, Wo - w0)) for w0 in range(0, Wo, wc)]
        w0l, wcl = col_chunks[-1]
        lastx = w0l * stride + (wcl - 1) * stride + Dx - 1 - leftx
        botx = max(0, lastx - (W - 1))
        depth = Dy * ((wc - 1) * stride + Dx)
    xpad = jnp.pad(x, ((0, 0), (top, bot), (leftx, botx), (0, 0)))

    # A-chunk budget ~256 MB (res3 at 640^2 would otherwise build 1.2 GB)
    hc = max(1, min(Ho, (2 ** 28) // max(1, B * S * depth * 2)))

    def sample_chunk(xrows, off_c, mask_c, anchor_c, h):
        """xrows: (B, (h-1)*stride + Dy, Wp, C); off_c: (B, h, Wo, K, 2)."""
        cdt = x.dtype
        off = off_c.astype(jnp.float32)

        # ---- y axis: 2-hot over the Dy window -------------------------
        rel = ky + off[..., 0]                     # (B, h, Wo, K)
        rel = jnp.clip(rel, lo - 2.0, lo + Dy + 1.0)
        iy = jnp.floor(rel)
        fy = rel - iy
        # true absolute corner rows (CUDA per-corner validity)
        abs_y0 = anchor_c[None, :, None, None] + iy
        v0 = (abs_y0 >= 0) & (abs_y0 <= H - 1)
        v1 = (abs_y0 + 1 >= 0) & (abs_y0 + 1 <= H - 1)
        # window slot of the low corner, clamped into the window
        s0 = jnp.clip(iy - lo, 0, Dy - 2).astype(jnp.int32)
        slots = jnp.arange(Dy, dtype=jnp.int32)
        wy0 = ((1.0 - fy) * v0)[..., None] * (slots == s0[..., None])
        wy1 = (fy * v1)[..., None] * (slots == s0[..., None] + 1)
        Ay = wy0 + wy1                             # (B, h, Wo, K, Dy)
        if mask_c is not None:
            Ay = Ay * mask_c[..., None].astype(Ay.dtype)
        Ay = Ay.astype(cdt)

        # ---- x axis: absolute corner positions ------------------------
        px = base_x[None, :h] + off[..., 1]        # (B, h, Wo, K)
        px = jnp.clip(px, -2.0, W + 1.0)
        ix = jnp.floor(px)
        fx = px - ix
        ixi = ix.astype(jnp.int32)

        def strips_of(xr):
            # Dy shifted row views of the window -> (B, h, Dy, width, C)
            return jnp.stack(
                [jax.lax.slice_in_dim(xr, dy, dy + (h - 1) * stride + 1,
                                      stride, axis=1) for dy in range(Dy)],
                axis=2)

        if Dx is None:
            cols = jnp.arange(W, dtype=jnp.int32)
            # out-of-image corners miss the one-hot entirely -> zero
            # weight, matching dmcn_im2col_bilinear's per-corner validity
            Ax = ((1.0 - fx)[..., None] * (cols == ixi[..., None])
                  + fx[..., None] * (cols == ixi[..., None] + 1))
            Ax = Ax.reshape(B, h, S, W).astype(cdt)
            strips = strips_of(xrows)
            A = (Ay.reshape(B, h, S, Dy)[..., :, None]
                 * Ax[..., None, :]).reshape(B, h, S, Dy * W)
            out = jnp.einsum("bhsk,bhkc->bhsc", A,
                             strips.reshape(B, h, Dy * W, C),
                             preferred_element_type=jnp.float32)
            return out.astype(cdt)

        # ---- windowed x: joint contraction per column chunk ------------
        outs_c = []
        for (w0, wcj) in col_chunks:
            Dxw = (wcj - 1) * stride + Dx
            Sj = wcj * K
            csl = (slice(None), slice(None), slice(w0, w0 + wcj))
            ix_j, fx_j = ixi[csl], fx[csl]
            # true-corner validity (the slot clamp below could otherwise
            # pull an out-of-image corner onto a valid slot)
            vx0 = (ix_j >= 0) & (ix_j <= W - 1)
            vx1 = (ix_j + 1 >= 0) & (ix_j + 1 <= W - 1)
            u0 = jnp.clip(ix_j - (w0 * stride - leftx), 0, Dxw - 2)
            xslots = jnp.arange(Dxw, dtype=jnp.int32)
            Ax = (((1.0 - fx_j) * vx0)[..., None]
                  * (xslots == u0[..., None])
                  + (fx_j * vx1)[..., None] * (xslots == u0[..., None] + 1))
            Ax = Ax.reshape(B, h, Sj, Dxw).astype(cdt)
            xr = jax.lax.slice_in_dim(
                xrows, w0 * stride, w0 * stride + Dxw, 1, axis=2)
            strips = strips_of(xr)
            A = (Ay[csl].reshape(B, h, Sj, Dy)[..., :, None]
                 * Ax[..., None, :]).reshape(B, h, Sj, Dy * Dxw)
            o = jnp.einsum("bhsk,bhkc->bhsc", A,
                           strips.reshape(B, h, Dy * Dxw, C),
                           preferred_element_type=jnp.float32)
            outs_c.append(o.reshape(B, h, wcj, K, C))
        out = jnp.concatenate(outs_c, axis=2).reshape(B, h, S, C)
        return out.astype(cdt)

    offr = offsets.reshape(B, Ho, Wo, K, 2)
    maskr = None if mask is None else mask.reshape(B, Ho, Wo, K)
    anchor = jnp.asarray(np.arange(Ho) * stride - pad, jnp.float32)
    outs = []
    for h0 in range(0, Ho, hc):
        h = min(hc, Ho - h0)
        xrows = jax.lax.slice_in_dim(
            xpad, h0 * stride, h0 * stride + (h - 1) * stride + Dy, 1, axis=1)
        outs.append(jax.checkpoint(sample_chunk, static_argnums=(4,))(
            xrows, offr[:, h0:h0 + h],
            None if maskr is None else maskr[:, h0:h0 + h],
            anchor[h0:h0 + h], h))
    sampled = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return sampled.reshape(B, Ho * Wo, K, C)


def _sample_gather(x, offsets, mask, base_y, base_x, *, Ho, Wo, K, dtype):
    """Original 4-corner gather path (parity oracle for 'dense')."""
    B, H, W, C = x.shape
    P = Ho * Wo * K

    # The bilinear-sample stage is wrapped in jax.checkpoint: its backward
    # would otherwise keep the four (B, P, C) corner gathers + fractional
    # weights alive per DCN block (23 blocks in R-101-DCNv2 -> tens of GB
    # of residuals); recomputing the gathers in the backward pass costs a
    # few extra gather ops and keeps only (x, offsets, mask) live.
    @jax.checkpoint
    def bilinear_sample(x, offsets, mask):
        off = offsets.reshape(B, Ho, Wo, K, 2).astype(jnp.float32)
        py = base_y[None] + off[..., 0]   # (B, Ho, Wo, K)
        px = base_x[None] + off[..., 1]

        y0 = jnp.floor(py)
        x0 = jnp.floor(px)
        wy = py - y0
        wx = px - x0

        x_flat = x.reshape(B, H * W, C)

        def corner(yc, xc):
            iy = yc.astype(jnp.int32)
            ix = xc.astype(jnp.int32)
            valid = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
            idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
            return _gather_bhwc(
                x_flat, idx.reshape(B, P), H, W, valid.reshape(B, P)
            )

        g00 = corner(y0, x0)
        g01 = corner(y0, x0 + 1)
        g10 = corner(y0 + 1, x0)
        g11 = corner(y0 + 1, x0 + 1)

        wy = wy.reshape(B, P, 1).astype(g00.dtype)
        wx = wx.reshape(B, P, 1).astype(g00.dtype)
        sampled = (
            g00 * (1 - wy) * (1 - wx)
            + g01 * (1 - wy) * wx
            + g10 * wy * (1 - wx)
            + g11 * wy * wx
        )  # (B, P, C)

        if mask is not None:
            sampled = sampled * mask.reshape(B, P, 1).astype(sampled.dtype)
        return sampled.reshape(B, Ho * Wo, K, C).astype(dtype)

    return bilinear_sample(x, offsets, mask)


# ---------------------------------------------------------------------------
# Fused Pallas sampling (impl='pallas')
# ---------------------------------------------------------------------------

def _on_tpu_backend() -> bool:
    try:
        return jax.devices()[0].platform.lower() in ("tpu", "axon")
    except Exception:  # noqa: BLE001 - no backend at all
        return False


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _sample_pallas(x, offsets, mask, *, stride, pad, Dy, kh, dilation,
                   Ho, Wo, K, Dx=None, wc=16):
    """Same sampling math as ``_sample_dense`` (module docstring), fused:
    per output row the kernel builds the joint (S, Dy*DxwP) interpolation
    matrix A directly in VMEM (one broadcast-compare expression over a
    static (d, u) lane index grid -- no 3D outer-product intermediate) and
    contracts it against the (Dy*DxwP, C) input window sliced from the
    whole per-image feature map, which is resident in VMEM for the entire
    grid row. A and the Dy-replicated row strips of the dense path never
    exist in HBM. Forward only; gradients come from the dense path's VJP
    (``_pallas_sampler``), so they are identical to ``impl='dense'``.
    """
    B, H, W, C = x.shape
    f = _pallas_sampler(B, H, W, C, jnp.dtype(x.dtype).name, stride, pad,
                        Dy, kh, dilation, Ho, Wo, K,
                        None if Dx is None else int(Dx), int(wc),
                        mask is None, not _on_tpu_backend())
    if mask is None:
        mask = jnp.ones((offsets.shape[0], Ho, Wo, K), jnp.float32)
    return f(x, offsets.reshape(B, Ho, Wo, K, 2), mask.reshape(B, Ho, Wo, K))


@functools.lru_cache(maxsize=64)
def _pallas_sampler(B, H, W, C, dtype_name, stride, pad, Dy, kh, dilation,
                    Ho, Wo, K, Dx, wc, mask_was_none, interpret):
    """Build (and cache per static geometry) the custom_vjp'd sampler."""
    cdt = jnp.dtype(dtype_name)
    lo = pad - (Dy - 2) // 2
    top = -lo + pad
    last = (Ho - 1) * stride + lo + Dy - 1 - pad
    bot = max(0, last - (H - 1))

    if Dx is None:                       # full-row window == whole width
        wc_eff, Dxw, leftx = Wo, W, 0
    else:
        wc_eff, Dxw, leftx = wc, (wc - 1) * stride + Dx, (Dx - 2) // 2
        if (wc_eff * stride) % 8 != 0:
            raise ValueError(
                "impl='pallas' needs x_chunk*stride to be a multiple of 8 "
                f"(got {wc_eff}*{stride}): the per-chunk column start "
                "j*x_chunk*stride must be provably sublane-aligned for "
                "Mosaic's vector load. Use the default x_chunk=16 or a "
                "multiple of 8/stride.")
    sub = 16 if cdt == jnp.bfloat16 else 8
    DxwP = _round_up(Dxw, sub)
    L = Dy * DxwP
    ncj = -(-Wo // wc_eff)
    hk = min(8, Ho)
    nrc = -(-Ho // hk)
    Ho_p, Wo_p = nrc * hk, ncj * wc_eff
    S = wc_eff * K
    # zero cols so every chunk's DxwP-wide window stays in bounds
    botx = max(0, (ncj - 1) * wc_eff * stride + DxwP - (W + leftx))
    # zero rows so every (possibly Ho-padded) row window stays in bounds
    Hp = max(top + H + bot, (Ho_p - 1) * stride + Dy)

    def kernel(x_ref, offy_ref, offx_ref, m_ref, out_ref):
        rc = pl.program_id(1)
        j = pl.program_id(2)

        # per-s tap/column indices, (S, 1) SUBLANE-oriented (s = wo*K + k).
        # Mosaic cannot shape-cast lane->sublane, so everything per-s is
        # built (or block-fed) in (S, 1) orientation from the start.
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
        k_of_s = s_iota % K
        ky_tap = ((k_of_s // kh) * dilation).astype(jnp.float32)
        kx_tap = ((k_of_s % kh) * dilation).astype(jnp.float32)
        wo = (j * wc_eff + s_iota // K).astype(jnp.float32)
        win0 = (j * wc_eff * stride - leftx).astype(jnp.float32)

        # static (S, L) lane-index decomposition l = d * DxwP + u
        l_d = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1) // DxwP
        l_u = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1) % DxwP

        # static unroll over the hk rows (Mosaic has no dynamic_slice on
        # VALUES; with r static everything below is static slicing except
        # the x-window ref reads, which use pl.ds)
        for r in range(hk):
            offy = offy_ref[0, r].astype(jnp.float32)   # (S, 1)
            offx = offx_ref[0, r].astype(jnp.float32)
            mod = m_ref[0, r].astype(jnp.float32)

            # ---- y axis: 2-hot over the Dy window slots -----------------
            anchor = ((rc * hk + r) * stride - pad).astype(jnp.float32)
            rel = jnp.clip(ky_tap + offy, lo - 2.0, lo + Dy + 1.0)
            iy = jnp.floor(rel)
            fy = rel - iy
            abs_y0 = anchor + iy
            v0 = ((abs_y0 >= 0) & (abs_y0 <= H - 1)).astype(jnp.float32)
            v1 = ((abs_y0 + 1 >= 0) & (abs_y0 + 1 <= H - 1)).astype(
                jnp.float32)
            ay0 = (1.0 - fy) * v0 * mod             # weight at slot s0
            ay1 = fy * v1 * mod                     # weight at slot s0 + 1
            s0 = jnp.clip(iy - lo, 0, Dy - 2).astype(jnp.int32)

            # ---- x axis: 2-hot over the window columns ------------------
            px = jnp.clip(wo * stride - pad + kx_tap + offx, -2.0, W + 1.0)
            ix = jnp.floor(px)
            fx = px - ix
            vx0 = ((ix >= 0) & (ix <= W - 1)).astype(jnp.float32)
            vx1 = ((ix + 1 >= 0) & (ix + 1 <= W - 1)).astype(jnp.float32)
            if Dx is None:
                # full-row window is EXACT: out-of-range u0 matches no lane
                # (the dense path's unclamped one-hot; validity covers the
                # half-in corners)
                u0 = (ix - win0).astype(jnp.int32)
            else:
                u0 = jnp.clip(ix - win0, 0, Dxw - 2).astype(jnp.int32)
            ax0 = (1.0 - fx) * vx0
            ax1 = fx * vx1

            a_y = ay0 * (l_d == s0) + ay1 * (l_d == s0 + 1)
            a_x = ax0 * (l_u == u0) + ax1 * (l_u == u0 + 1)
            A = (a_y * a_x).astype(cdt)             # (S, L), VMEM only

            row0 = (rc * hk + r) * stride
            # Column start must be PROVABLY sublane-aligned for Mosaic's
            # vector load (multiple of 8; the row axis is untiled and free).
            # Full-row case: ncj == 1, the block IS the whole padded row
            # (width == DxwP) -> static start 0 (a dynamic j*Wo*stride here
            # failed Mosaic whenever Wo*stride wasn't a multiple of 8, e.g.
            # res5 W=20). Windowed case: wc_eff*stride is checked to be a
            # multiple of 8 in the factory, so j*(wc_eff*stride) factors.
            xstart = 0 if Dx is None else j * (wc_eff * stride)
            xwin = x_ref[0, pl.ds(row0, Dy), pl.ds(xstart, DxwP)]
            res = jnp.dot(A, xwin.reshape(L, C),
                          preferred_element_type=jnp.float32)
            out_ref[0, r] = res.astype(out_ref.dtype)

    def vspec(block, imap):
        return pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)

    def fwd(x, offr, maskr):
        xpad = jnp.pad(x, ((0, 0), (top, Hp - top - H), (leftx, botx),
                           (0, 0)))
        offp = jnp.pad(offr, ((0, 0), (0, Ho_p - Ho), (0, Wo_p - Wo),
                              (0, 0), (0, 0)))
        maskp = jnp.pad(maskr, ((0, 0), (0, Ho_p - Ho), (0, Wo_p - Wo),
                                (0, 0)))
        # per-s quantities feed the kernel in (.., S, 1) SUBLANE orientation
        # (see kernel comment); these reshapes run in XLA, outside pallas
        def scol(a):
            return a.reshape(B, Ho_p, ncj * S, 1)
        sspec = vspec((1, hk, S, 1), lambda b, rc, j: (b, rc, j, 0))
        out = pl.pallas_call(
            kernel,
            grid=(B, nrc, ncj),
            in_specs=[
                vspec((1, Hp, W + leftx + botx, C),
                      lambda b, rc, j: (b, 0, 0, 0)),
                sspec, sspec, sspec,
            ],
            out_specs=vspec((1, hk, S, C), lambda b, rc, j: (b, rc, j, 0)),
            out_shape=jax.ShapeDtypeStruct((B, Ho_p, ncj * S, C), cdt),
            interpret=interpret,
        )(xpad, scol(offp[..., 0]), scol(offp[..., 1]), scol(maskp))
        out = out.reshape(B, Ho_p, Wo_p, K, C)[:, :Ho, :Wo]
        return out.reshape(B, Ho * Wo, K, C)

    # gradients: exact VJP of the dense formulation (same outputs), so
    # 'pallas' and 'dense' train identically; only the forward is fused.
    ox = np.arange(Wo) * stride - pad
    kyg, kxg = np.meshgrid(np.arange(kh) * dilation,
                           np.arange(kh) * dilation, indexing="ij")
    # numpy on purpose: this factory is lru_cached, and a jnp constant
    # created under the first caller's trace would leak that trace's tracer
    # into later calls. _sample_dense broadcasts numpy at trace time.
    base_x = np.broadcast_to(
        (ox[None, :, None] + kxg.reshape(-1)[None, None, :]).astype(
            np.float32), (Ho, Wo, K))

    def dense_fn(x, offr, maskr):
        return _sample_dense(
            x, offr.reshape(B, Ho, Wo, 2 * K),
            None if mask_was_none else maskr, base_x,
            stride=stride, pad=pad, Dy=Dy, kh=kh, dilation=dilation,
            Ho=Ho, Wo=Wo, K=K, Dx=Dx, wc=wc)

    @jax.custom_vjp
    def f(x, offr, maskr):
        return fwd(x, offr, maskr)

    def f_fwd(x, offr, maskr):
        return fwd(x, offr, maskr), (x, offr, maskr)

    def f_bwd(res, g):
        x, offr, maskr = res
        _, vjp = jax.vjp(dense_fn, x, offr, maskr)
        dx, doff, dmask = vjp(g)
        if mask_was_none:
            dmask = jnp.zeros_like(maskr)
        return dx, doff, dmask

    f.defvjp(f_fwd, f_bwd)
    return f
