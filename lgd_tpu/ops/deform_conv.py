"""Modulated deformable convolution (DCNv2) for TPU.

TPU-native equivalent of detectron2's ``deform_conv.cu`` CUDA kernel
(reference dependency; enabled by MODEL.RESNETS.DEFORM_ON_PER_STAGE /
DEFORM_MODULATED in the *_dcnv2_* configs — SURVEY.md §2.3). Strategy:
bilinear-sample an im2col patch tensor with learned offsets via four
batched gathers, then contract the (K*Cin) patch axis against the kernel on
the MXU. Everything is shape-static; XLA lowers the gathers to dynamic-slice
batches and fuses the interpolation arithmetic.

Offset channel layout matches detectron2: per kernel tap k, channels
(2k, 2k+1) = (dy_k, dx_k); modulation mask has one channel per tap and is
already sigmoid-activated by the caller.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


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
):
    """Modulated deformable conv.

    Args:
        x: (B, H, W, C) input.
        weight: (kh, kw, C // groups, F).
        offsets: (B, Ho, Wo, 2*kh*kw) float32 (dy, dx per tap).
        mask: optional (B, Ho, Wo, kh*kw) modulation in [0, 1].
        stride/dilation: ints (padding is fixed to 'SAME'-style dilation*k//2
            as used by the ResNet 3x3).
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

    sampled = bilinear_sample(x, offsets, mask)
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
