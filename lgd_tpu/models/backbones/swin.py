"""Swin Transformer backbone (Swin-Tiny), TPU-native.

Re-implements the behavior of the vendored Swin
(reference models/thirdparty_backbones/swint/swin_transformer.py:76-732):
patch embed, window attention with relative-position bias, cyclic-shift
SW-MSA, patch merging, per-stage output norms, stage freezing via optimizer
masks. TPU deltas: NHWC layout; the shifted-window attention mask and the
relative-position index are *static* given the padded canvas, so they are
computed in numpy at trace time and baked into the program (no device-side
mask construction per step, unlike the reference's on-the-fly img_mask,
swin_transformer.py:310-334); window partition is pure reshape/transpose
which XLA fuses.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn



def _rel_pos_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) index into the (2*ws-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))  # (2, ws, ws)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (N, N)


def _shift_attn_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """Static SW-MSA mask: (nW, N, N) with 0 for same-region pairs, -100
    otherwise (swin_transformer.py:310-334 semantics)."""
    img_mask = np.zeros((hp, wp), np.int32)
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[h, w] = cnt
            cnt += 1
    m = img_mask.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    m = m.reshape(-1, ws * ws)  # (nW, N)
    attn = (m[:, None, :] != m[:, :, None]).astype(np.float32) * -100.0
    return attn


def window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nW, ws*ws, C); H, W divisible by ws."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_reverse(x, ws: int, B: int, H: int, W: int):
    C = x.shape[-1]
    x = x.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def _shift_perms(hp: int, wp: int, ws: int, shift: int):
    """Static permutations so the cyclic shift runs IN window layout.

    The stage keeps tokens window-partitioned ((B, nW*N, C), window-major
    flat order); `perm` satisfies
        x_win[perm] == window_partition(roll(canvas, (-shift, -shift)))
    and `inv` undoes it. One static-index gather per direction replaces the
    reverse-transpose + roll + partition-transpose round trip (the Swin-T
    profile showed ~31 ms/step of such layout copies — PROFILES.md)."""
    canvas = np.arange(hp * wp).reshape(hp, wp)
    win = canvas.reshape(hp // ws, ws, wp // ws, ws).transpose(
        0, 2, 1, 3).reshape(-1)  # window slot -> canvas pixel
    rolled = np.roll(canvas, (-shift, -shift), axis=(0, 1))
    win_rolled = rolled.reshape(hp // ws, ws, wp // ws, ws).transpose(
        0, 2, 1, 3).reshape(-1)
    slot_of = np.empty(hp * wp, np.int32)
    slot_of[win] = np.arange(hp * wp, dtype=np.int32)
    perm = slot_of[win_rolled]
    inv = np.empty_like(perm)
    inv[perm] = np.arange(hp * wp, dtype=np.int32)
    return perm, inv


def _pad_keep_mask(h: int, w: int, hp: int, wp: int, ws: int) -> np.ndarray:
    """(nW, N) 1.0 for real canvas tokens, 0.0 for ws-padding tokens —
    re-zeroes the pad region each block (the reference pads zeros after
    norm1 every block, swin_transformer.py:219-223; pointwise multiply in
    window layout instead of a pad+crop round trip)."""
    m = np.zeros((hp, wp), np.float32)
    m[:h, :w] = 1.0
    return m.reshape(hp // ws, ws, wp // ws, ws).transpose(
        0, 2, 1, 3).reshape(-1, ws * ws)


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic or not self.has_rng("dropout"):
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask / keep


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (swin_transformer.py:76-154)."""

    dim: int
    num_heads: int
    window_size: int = 7
    qkv_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask=None):
        Bn, N, C = x.shape
        H = self.num_heads
        Dh = C // H
        ws = self.window_size

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, H),
        )
        idx = _rel_pos_index(ws)  # static numpy
        bias = table[idx.reshape(-1)].reshape(N, N, H)
        bias = bias.transpose(2, 0, 1)  # (H, N, N)

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(Bn, N, 3, H, Dh), 3, axis=2)
        # scale q BEFORE the matmul (reference: q = q * self.scale,
        # swin_transformer.py:133) and keep the (N, N) logits in the
        # compute dtype: under the reference's fp16 AMP the qk product,
        # bias/mask adds and attn @ v all run in half precision with only
        # the softmax autocast to fp32 — the profile showed the f32
        # (Bn, H, 49, 49) tensors were ~2x HBM traffic for nothing.
        q = q[:, :, 0].transpose(0, 2, 1, 3) * self.dtype(Dh ** -0.5)
        k = k[:, :, 0].transpose(0, 2, 1, 3)
        v = v[:, :, 0].transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)  # (Bn, H, N, N) cdt
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nW = mask.shape[0]
            attn = (attn.reshape(Bn // nW, nW, H, N, N)
                    + mask[None, :, None].astype(attn.dtype))
            attn = attn.reshape(Bn, H, N, N)
        attn = jax.nn.softmax(attn.astype(jnp.float32),
                              axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(Bn, N, C).astype(self.dtype)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    """One W-MSA / SW-MSA block, operating in WINDOW layout.

    Input/output: (B, nW, N, C) — the ws-padded canvas window-partitioned
    once per stage by the parent (partitioning there is a pure reshape, so
    non-shifted blocks touch no layout copies at all; shifted blocks do one
    static-permutation gather per direction instead of
    reverse+roll+partition). Numerically identical to the reference's
    per-block canvas round trip: LN/MLP/residuals are pointwise, pad tokens
    are re-zeroed after norm1 exactly as the reference's post-norm F.pad,
    and the shift permutation reproduces roll∘partition elementwise
    (swin_transformer.py:157-254)."""

    dim: int
    num_heads: int
    canvas_hw: Sequence[int]  # unpadded (H, W) of this stage — static
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, nW, N, C = x.shape
        H, W = self.canvas_hw
        ws = self.window_size
        shift = self.shift_size
        hp = -(-H // ws) * ws
        wp = -(-W // ws) * ws

        shortcut = x
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        if hp != H or wp != W:
            x = x * jnp.asarray(
                _pad_keep_mask(H, W, hp, wp, ws), self.dtype)[None, :, :, None]

        if shift > 0:
            perm, inv = _shift_perms(hp, wp, ws, shift)
            x = jnp.take(x.reshape(B, nW * N, C), jnp.asarray(perm),
                         axis=1).reshape(B, nW, N, C)
            mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
        else:
            mask = None

        xw = WindowAttention(self.dim, self.num_heads, ws,
                             dtype=self.dtype, name="attn")(
                                 x.reshape(B * nW, N, C), mask)
        x = xw.reshape(B, nW, N, C)

        if shift > 0:
            x = jnp.take(x.reshape(B, nW * N, C), jnp.asarray(inv),
                         axis=1).reshape(B, nW, N, C)

        x = shortcut + DropPath(self.drop_path, name="drop_path1")(
            x, deterministic)

        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(y)
        return x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)


class PatchMerging(nn.Module):
    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        pad_h, pad_w = H % 2, W % 2
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinTransformer(nn.Module):
    """Swin backbone emitting {'stage2'..'stage5'} NHWC maps
    (swin_transformer.py:442-631)."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    patch_norm: bool = True
    ape: bool = False
    pretrain_img_size: int = 224
    patch_size: int = 4
    out_features: Sequence[str] = ("stage2", "stage3", "stage4", "stage5")
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.astype(self.dtype)
        # patch embed: conv 4x4 stride 4
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        if self.patch_norm:
            x = nn.LayerNorm(dtype=jnp.float32,
                             name="patch_norm")(x).astype(self.dtype)
        if self.ape:
            # absolute position embedding, bicubic-resized from the pretrain
            # grid to the padded canvas (swin_transformer.py:505-513,596-599;
            # NHWC here vs the reference's (1, C, Hp, Wp) buffer)
            pr = self.pretrain_img_size // self.patch_size
            pe = self.param("absolute_pos_embed",
                            nn.initializers.truncated_normal(0.02),
                            (1, pr, pr, self.embed_dim))
            pe = jax.image.resize(
                pe.astype(jnp.float32),
                (1, x.shape[1], x.shape[2], self.embed_dim),
                method="bicubic")
            x = x + pe.astype(self.dtype)

        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        outputs = {}
        dim = self.embed_dim
        ws = self.window_size
        block_idx = 0
        for stage in range(len(self.depths)):
            # window-partition ONCE per stage; blocks run in window layout
            # (see SwinBlock docstring — kills the per-block canvas copies)
            B, H, W, C = x.shape
            hp, wp = -(-H // ws) * ws, -(-W // ws) * ws
            if hp != H or wp != W:
                x = jnp.pad(x, ((0, 0), (0, hp - H), (0, wp - W), (0, 0)))
            x = x.reshape(B, hp // ws, ws, wp // ws, ws, C).transpose(
                0, 1, 3, 2, 4, 5).reshape(B, -1, ws * ws, C)
            for i in range(self.depths[stage]):
                x = SwinBlock(
                    dim=dim,
                    num_heads=self.num_heads[stage],
                    canvas_hw=(H, W),
                    window_size=ws,
                    shift_size=0 if i % 2 == 0 else ws // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=float(dpr[block_idx]),
                    dtype=self.dtype,
                    name=f"stage{stage + 2}_block{i}",
                )(x, deterministic)
                block_idx += 1
            x = x.reshape(B, hp // ws, wp // ws, ws, ws, C).transpose(
                0, 1, 3, 2, 4, 5).reshape(B, hp, wp, C)[:, :H, :W]
            name = f"stage{stage + 2}"
            if name in self.out_features:
                out = nn.LayerNorm(dtype=jnp.float32,
                                   name=f"{name}_norm")(x)
                outputs[name] = out.astype(self.dtype)
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim=dim, dtype=self.dtype,
                                 name=f"stage{stage + 2}_downsample")(x)
                dim *= 2
        return outputs


def build_swint(cfg, dtype=jnp.bfloat16) -> SwinTransformer:
    s = cfg.MODEL.SWINT
    return SwinTransformer(
        embed_dim=s.EMBED_DIM,
        depths=tuple(s.DEPTHS),
        num_heads=tuple(s.NUM_HEADS),
        window_size=s.WINDOW_SIZE,
        mlp_ratio=float(s.MLP_RATIO),
        drop_path_rate=s.DROP_PATH_RATE,
        ape=bool(s.APE),
        out_features=tuple(s.OUT_FEATURES),
        dtype=dtype,
        name="bottom_up",
    )
