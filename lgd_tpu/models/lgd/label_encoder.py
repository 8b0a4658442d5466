"""Sparse label-appearance encoding (LGD module 1), padded & batched.

Re-implements the behavior of the reference LabelEncoder + STN
(models/customized_detectors/dynamic_teacher/label_encoder.py:119-276,
spatial_transformer.py:9-47) on fixed-capacity tensors:

- Ragged per-image descriptor lists (Ni, k) become (B, M', k) with a token
  validity mask; M' = MAX_INSTANCES (+1 fixed ctx slot if ADD_CONTEXT_BOX).
- The reference's 1x1 Conv1d stacks over a (T, k, 1) "point cloud of one
  point" are per-token MLPs; here they are single batched matmuls over
  (B, M', k) — MXU-shaped instead of T-length ragged convs.
- STN "max over points" (length-1 axis) is the identity, so each STN is a
  per-token MLP producing a (k, k) transform applied by bmm
  (spatial_transformer.py:30-47; identity shortcut deliberately removed
  there, so none here either).
- Hierarchical pooling = masked max over valid tokens per image
  (label_encoder.py:195-213; R=1 so the repeat-mean is the identity).
- The whole descriptor construction is stop_gradient'd like the reference's
  @torch.no_grad() (label_encoder.py:12,164).

Descriptor layout (box_descriptor_encode, label_encoder.py:12-115):
[x1/W, y1/H, x2/W, y2/H, one_hot(80) [, mask49]] scaled from (0,1) to (-1,1).
W/H are the padded canvas dims (the reference uses images.tensor size).
Empty-GT images get a fallback (0,0,1,1) box with all-zero one-hot
(label_encoder.py:57-69,100-102); the ctx slot gets the whole-image box with
all-zero one-hot and all-ones mask49.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.normalization import layer_norm
from ...structures import BatchedInstances


def encode_descriptors(
    gt: BatchedInstances,
    padded_hw: Tuple[int, int],
    num_classes: int = 80,
    add_context_box: bool = False,
    parse_mask: bool = False,
):
    """Build padded descriptors + token-level metadata.

    Returns:
        desc: (B, M', k) float32 in (-1, 1)
        token_valid: (B, M') bool (includes fallback + ctx slots)
        boxes: (B, M', 4) clamped boxes in the padded-image frame (the
            ``boxlists`` the teacher's inside-masks consume)
        is_ctx: (M',) bool static marker of the ctx slot
    """
    H, W = padded_hw
    B, M = gt.valid.shape

    any_valid = jnp.any(gt.valid, axis=1)  # (B,)
    # fallback slot 0 for empty images (label_encoder.py:57-69)
    fallback_box = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    boxes = gt.boxes
    boxes = jnp.where(
        any_valid[:, None, None],
        boxes,
        jnp.zeros_like(boxes).at[:, 0, :].set(fallback_box),
    )
    valid = jnp.where(
        any_valid[:, None],
        gt.valid,
        jnp.zeros_like(gt.valid).at[:, 0].set(True),
    )
    onehot = jax.nn.one_hot(gt.classes, num_classes) * gt.valid[..., None]
    # fallback token keeps an all-zero one-hot (label_encoder.py:100-102)
    onehot = jnp.where(any_valid[:, None, None], onehot, jnp.zeros_like(onehot))

    if parse_mask:
        masks49 = gt.masks49
        assert masks49 is not None, "LOAD_LABELMAP requires gt.masks49"
        masks49 = jnp.where(any_valid[:, None, None], masks49, 0.0)
    else:
        masks49 = None

    if add_context_box:
        ctx_box = jnp.asarray([0.0, 0.0, float(W), float(H)])
        boxes = jnp.concatenate(
            [boxes, jnp.broadcast_to(ctx_box, (B, 1, 4))], axis=1
        )
        # ctx appended only when the image has GT (label_encoder.py:75-77)
        valid = jnp.concatenate([valid, any_valid[:, None]], axis=1)
        onehot = jnp.concatenate(
            [onehot, jnp.zeros((B, 1, num_classes))], axis=1
        )
        if masks49 is not None:
            masks49 = jnp.concatenate([masks49, jnp.ones((B, 1, 49))], axis=1)

    # clamp to [0, dim-1] (dynamic_teacher/utils.py:40-51)
    x1 = jnp.clip(boxes[..., 0], 0, W - 1)
    y1 = jnp.clip(boxes[..., 1], 0, H - 1)
    x2 = jnp.clip(boxes[..., 2], 0, W - 1)
    y2 = jnp.clip(boxes[..., 3], 0, H - 1)
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)

    norm_boxes = boxes / jnp.asarray([W, H, W, H], jnp.float32)
    parts = [norm_boxes, onehot]
    if masks49 is not None:
        parts.append(masks49)
    desc = jnp.concatenate(parts, axis=-1)
    desc = desc * 2.0 - 1.0  # range_scaling (0,1)->(-1,1) (utils.py:16-24)
    desc = desc * valid[..., None]  # zero padded tokens

    Mp = M + (1 if add_context_box else 0)
    is_ctx = jnp.zeros((Mp,), bool)
    if add_context_box:
        is_ctx = is_ctx.at[M].set(True)
    return (
        jax.lax.stop_gradient(desc),
        valid,
        jax.lax.stop_gradient(boxes),
        is_ctx,
    )


class TokenMLP(nn.Module):
    """Linear + affine-free channel-LayerNorm + ReLU per token (the
    reference's Conv1d(k=1)+LayerNorm([C,1]) pattern)."""

    features: int
    use_norm: bool = True
    use_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features, dtype=self.dtype, name="linear")(x)
        if self.use_norm:
            x = layer_norm(x.astype(jnp.float32), axis=-1).astype(x.dtype)
        if self.use_relu:
            x = nn.relu(x)
        return x


class STN(nn.Module):
    """Per-token transform predictor (spatial_transformer.py:9-47):
    k -> 64 -> 128 -> 1024 (LN+relu each) -> 512 -> 256 (LN+relu) -> k*k."""

    k: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = TokenMLP(64, dtype=self.dtype, name="conv1")(x)
        h = TokenMLP(128, dtype=self.dtype, name="conv2")(h)
        h = TokenMLP(1024, dtype=self.dtype, name="conv3")(h)
        # (max over a length-1 point axis == identity)
        h = TokenMLP(512, dtype=self.dtype, name="fc1")(h)
        h = TokenMLP(256, dtype=self.dtype, name="fc2")(h)
        t = nn.Dense(self.k * self.k, dtype=self.dtype, name="fc3")(h)
        return t.reshape(*x.shape[:-1], self.k, self.k)


class LabelEncoder(nn.Module):
    """(B, M', k) descriptors -> (B, M', 256) label embeddings."""

    num_classes: int = 80
    add_context_box: bool = False
    parse_mask: bool = False
    dtype: Any = jnp.float32

    @property
    def inp(self) -> int:
        k = 4 + self.num_classes
        if self.parse_mask:
            k += 49
        return k

    @nn.compact
    def __call__(self, desc, token_valid):
        k = self.inp
        assert desc.shape[-1] == k, (desc.shape, k)

        # descriptor-space transform
        t_desc = STN(k, dtype=self.dtype, name="stn_desc")(desc)
        x = jnp.einsum("bmk,bmkl->bml", desc, t_desc)

        x = TokenMLP(64, dtype=self.dtype, name="conv1")(x)

        # feature-space transform
        t_feat = STN(64, dtype=self.dtype, name="stn_feat")(x)
        x_feat = jnp.einsum("bmk,bmkl->bml", x, t_feat)

        x = TokenMLP(128, dtype=self.dtype, name="conv2")(x_feat)
        x = TokenMLP(1024, dtype=self.dtype, name="conv3")(x)

        # hierarchical pooling: masked max over valid tokens per image
        neg = jnp.full_like(x, -1e9)
        x_masked = jnp.where(token_valid[..., None], x, neg)
        x_g = jnp.max(x_masked, axis=1)  # (B, 1024)

        # concat local(64) + broadcast global(1024) -> conv4 -> (B, M', 256)
        x_cat = jnp.concatenate(
            [x_feat, jnp.broadcast_to(x_g[:, None, :], (*x_feat.shape[:2], 1024))],
            axis=-1,
        )
        out = TokenMLP(256, dtype=self.dtype, name="conv4")(x_cat)
        return out * token_valid[..., None]
