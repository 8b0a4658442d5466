"""DynamicTeacher: label-guided teacher feature-pyramid synthesis (LGD core).

Re-implements the behavior of the reference DynamicTeacher
(models/customized_detectors/dynamic_teacher/dynamic_teacher.py:16-301) in a
fully padded, shape-static form:

- The reference flattens all images' instances into one ragged (T, 1, C)
  sequence and blocks cross-image attention with a (T, T) block-diagonal
  mask (dynamic_teacher.py:255-270). Here tokens stay batched as (B, M', C):
  per-image attention with a key-validity mask is *exactly* the
  block-diagonal computation, with zero ragged bookkeeping and MXU-shaped
  einsums.
- Inside-GT masks (utils.py:53-89) are computed vectorized per level as
  (B, M', Hi*Wi); the segmentation-mask variant (utils.py:92-132, the
  LOAD_LABELMAP path) nearest-resamples host-rasterized stride-8 bitmasks.
- Mask pooling (aggregate_per_level, dynamic_teacher.py:81-103) and
  rendering scatter (dynamic_teacher.py:106-206) are batched einsums.
- The ctx (whole-image) token occupies a fixed slot M instead of the ragged
  "last position per image"; semantics identical.

Interact patterns ('stuGuided' default, plus 'labelGuided', 'student_fill',
'teacher_fill') follow dynamic_teacher.py:261-275.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.normalization import group_norm
from ...structures import BatchedInstances
from .label_encoder import LabelEncoder, TokenMLP, encode_descriptors


def inside_gt_masks(boxes, padded_hw, level_hw):
    """Vectorized get_inside_gt_mask (reference utils.py:53-89).

    boxes: (B, M', 4) clamped x1y1x2y2 in the (H, W) padded frame.
    Returns (B, M', hi*wi) float 0/1: grid cell (y, x) is inside iff
    |center - (y, x)| / scale <= 0.5 in both dims after scaling boxes by
    (hi/H, wi/W).
    """
    H, W = padded_hw
    hi, wi = level_hw
    ry, rx = hi / H, wi / W
    x1 = boxes[..., 0] * rx
    y1 = boxes[..., 1] * ry
    x2 = boxes[..., 2] * rx
    y2 = boxes[..., 3] * ry
    xc = (x1 + x2) * 0.5
    yc = (y1 + y2) * 0.5
    w = jnp.maximum(x2 - x1, 1e-6)
    h = jnp.maximum(y2 - y1, 1e-6)

    ys = jnp.arange(hi, dtype=jnp.float32)
    xs = jnp.arange(wi, dtype=jnp.float32)
    in_y = (
        jnp.abs(yc[..., None] - ys) / h[..., None] <= 0.5
    )  # (B, M', hi)
    in_x = (
        jnp.abs(xc[..., None] - xs) / w[..., None] <= 0.5
    )  # (B, M', wi)
    mask = in_y[..., :, None] & in_x[..., None, :]  # (B, M', hi, wi)
    return mask.reshape(*mask.shape[:-2], hi * wi).astype(jnp.float32)


def segmask_inside_masks(bitmasks, is_ctx, level_hw):
    """LOAD_LABELMAP variant (reference utils.py:92-132): per-instance
    rasterized masks nearest-resampled to the level grid; ctx slot all-ones.

    bitmasks: (B, M, Hs, Ws) uint8 (host-rasterized at TPU.SEGMASK_STRIDE,
    aligned to the padded canvas). Returns (B, M', hi*wi) float.
    """
    B, M, Hs, Ws = bitmasks.shape
    hi, wi = level_hw
    ys = jnp.clip((jnp.arange(hi) * Hs) // hi, 0, Hs - 1)
    xs = jnp.clip((jnp.arange(wi) * Ws) // wi, 0, Ws - 1)
    m = bitmasks[:, :, ys][:, :, :, xs].astype(jnp.float32)  # (B, M, hi, wi)
    m = m.reshape(B, M, hi * wi)
    Mp = is_ctx.shape[0]
    if Mp == M + 1:
        ctx = jnp.ones((B, 1, hi * wi), jnp.float32)
        m = jnp.concatenate([m, ctx], axis=1)
    return m


class MultiHeadAttention(nn.Module):
    """Batched MHA matching ``nn.MultiheadAttention(C, nheads)`` semantics:
    in-proj (q, k, v) with bias, scaled dot-product, out-proj with bias.
    ``key_valid`` masks padded KEY tokens; padded QUERY rows are zeroed by
    the caller. Cross-image isolation comes from batching (see module
    docstring)."""

    channels: int = 256
    num_heads: int = 8
    attn_impl: str = "auto"  # cfg.TPU.ATTENTION_IMPL: pallas/reference/auto
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, key_valid):
        C, H = self.channels, self.num_heads
        Dh = C // H
        B, Mq, _ = q.shape
        Mk = k.shape[1]

        dense = lambda name: nn.Dense(C, dtype=self.dtype, name=name)
        qh = dense("q_proj")(q).reshape(B, Mq, H, Dh).transpose(0, 2, 1, 3)
        kh = dense("k_proj")(k).reshape(B, Mk, H, Dh).transpose(0, 2, 1, 3)
        vh = dense("v_proj")(v).reshape(B, Mk, H, Dh).transpose(0, 2, 1, 3)

        from ...ops.attention import masked_attention

        out = masked_attention(qh, kh, vh, key_valid,
                               scale=1.0 / Dh ** 0.5, impl=self.attn_impl)
        out = out.transpose(0, 2, 1, 3).reshape(B, Mq, C).astype(q.dtype)
        return dense("out_proj")(out)


class SharedConvGN(nn.Module):
    """conv3x3 + GroupNorm(nr_groups, affine-optional) + optional ReLU,
    shared across FPN levels (get_CONVS, dynamic_teacher/layers.py:22-32)."""

    channels: int = 256
    use_relu: bool = True
    use_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv")(x)
        if self.use_norm:
            x = group_norm(x.astype(jnp.float32), num_groups=1).astype(x.dtype)
        if self.use_relu:
            x = nn.relu(x)
        return x


class DynamicTeacher(nn.Module):
    """Consumes (GT, student FPN features) and emits a teacher feature
    pyramid with identical shapes. No backbone (reference
    dynamic_teacher.py:14,285-301)."""

    num_classes: int = 80
    channels: int = 256
    num_heads: int = 8
    interact_pattern: str = "stuGuided"
    add_context_box: bool = False
    detach_appearance_embed: bool = False
    use_seg_map: bool = False
    attn_impl: str = "auto"
    dtype: Any = jnp.float32

    def setup(self):
        self.label_encoder = LabelEncoder(
            num_classes=self.num_classes,
            add_context_box=self.add_context_box,
            parse_mask=self.use_seg_map,
            dtype=self.dtype,
            name="label_encoder_",
        )
        self.canoni_proj_1d = TokenMLP(
            self.channels, dtype=self.dtype, name="canoni_proj_1D"
        )
        self.student_proj_2d = SharedConvGN(
            self.channels, dtype=self.dtype, name="student_proj_2D"
        )
        self.local_inst_proj_2d = nn.Conv(
            self.channels, (3, 3), padding="SAME", dtype=self.dtype,
            name="local_inst_proj_2D",
        )
        self.global_ctx_proj_1d = nn.Dense(
            self.channels, dtype=self.dtype, name="global_ctx_proj_1D"
        )
        self.local_inst_proj_1d = nn.Dense(
            self.channels, dtype=self.dtype, name="local_inst_proj_1D"
        )
        self.refine_1 = SharedConvGN(self.channels, dtype=self.dtype,
                                     name="refine_1")
        self.refine_2 = SharedConvGN(self.channels, dtype=self.dtype,
                                     name="refine_2")
        self.refine_3 = SharedConvGN(self.channels, use_relu=False,
                                     dtype=self.dtype, name="refine_3")
        self.attn = MultiHeadAttention(
            channels=self.channels, num_heads=self.num_heads,
            attn_impl=self.attn_impl, dtype=self.dtype,
            name="multi_head_attn",
        )

    def __call__(self, gt: BatchedInstances, stu_fpn_feats: Dict[str, jax.Array],
                 padded_hw: Tuple[int, int]):
        """Returns (teacher feats dict {level: (B, Hi, Wi, C)},
        inside_masks dict {level: (B, M', Hi*Wi)}, token_valid (B, M'))."""
        keys = sorted(stu_fpn_feats.keys())

        desc, token_valid, boxes, is_ctx = encode_descriptors(
            gt, padded_hw, self.num_classes,
            self.add_context_box, self.use_seg_map,
        )
        # (B, M', 256) label embeddings
        label_embed = self.label_encoder(desc, token_valid)
        canoni = self.canoni_proj_1d(label_embed)

        feats = stu_fpn_feats
        if self.detach_appearance_embed:
            feats = {k: jax.lax.stop_gradient(v) for k, v in feats.items()}

        # per-level inside-GT masks
        masks = {}
        for k in keys:
            hw = feats[k].shape[1:3]
            if self.use_seg_map:
                masks[k] = segmask_inside_masks(gt.bitmasks, is_ctx, hw)
            else:
                masks[k] = inside_gt_masks(boxes, padded_hw, hw)
            masks[k] = masks[k] * token_valid[..., None]

        # appearance embeddings: project student maps, mask-pool per level
        attn_outputs = {}
        for k in keys:
            f = self.student_proj_2d(feats[k].astype(self.dtype))
            B, hi, wi, C = f.shape
            f_flat = f.reshape(B, hi * wi, C)
            m = masks[k]
            pooled = jnp.einsum(
                "bmh,bhc->bmc", m, f_flat.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            denom = jnp.maximum(jnp.sum(m, axis=-1, keepdims=True), 1.0)
            pooled = (pooled / denom).astype(self.dtype)  # (B, M', C)

            if self.interact_pattern == "student_fill":
                out = pooled
            elif self.interact_pattern == "teacher_fill":
                out = canoni
            elif self.interact_pattern == "stuGuided":
                # Q = appearance embeds, K = V = label embeds
                # (dynamic_teacher.py:265-270)
                out = self.attn(pooled, canoni, canoni, token_valid)
            elif self.interact_pattern == "labelGuided":
                out = self.attn(canoni, pooled, pooled, token_valid)
            else:
                raise ValueError(self.interact_pattern)
            attn_outputs[k] = out * token_valid[..., None]

        # rendering + refinement (dynamic_teacher.py:106-206,280-281)
        tea_feats = {}
        for k in keys:
            B, hi, wi, C = feats[k].shape
            out = attn_outputs[k]
            if self.add_context_box:
                inst_tokens = out[:, :-1]
                inst_masks = masks[k][:, :-1]
                inst_valid = token_valid[:, :-1]
                ctx_token = out[:, -1]
            else:
                inst_tokens = out
                inst_masks = masks[k]
                inst_valid = token_valid
                ctx_token = None

            proj = self.local_inst_proj_1d(inst_tokens) * inst_valid[..., None]
            fmap = jnp.einsum(
                "bmc,bmh->bhc", proj.astype(jnp.float32),
                inst_masks, preferred_element_type=jnp.float32,
            ).astype(self.dtype).reshape(B, hi, wi, C)
            fmap = self.local_inst_proj_2d(fmap)
            if ctx_token is not None:
                ctx = self.global_ctx_proj_1d(ctx_token)
                fmap = fmap + ctx[:, None, None, :]
            fmap = nn.relu(fmap)

            fmap = self.refine_3(self.refine_2(self.refine_1(fmap)))
            tea_feats[k] = fmap

        return tea_feats, masks, token_valid
