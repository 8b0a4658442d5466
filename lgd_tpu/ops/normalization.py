"""Normalization primitives used across the framework (pure jnp; NHWC)."""

from __future__ import annotations

import jax.numpy as jnp


def instance_norm_2d(x, eps: float = 1e-5):
    """Affine-free InstanceNorm2d over NHWC: normalize each (H, W) slice per
    sample per channel. Equivalent of ``nn.InstanceNorm2d(C, affine=False)``
    in the distill loss (reference models/base_distillator.py:16-17,59-60)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def layer_norm(x, axis=-1, eps: float = 1e-5):
    """Affine-free LayerNorm over the given axis (the LGD label encoder uses
    ``nn.LayerNorm([C, 1], elementwise_affine=False)`` == per-token channel
    normalization; reference label_encoder.py:157-160)."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.var(x, axis=axis, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def group_norm(x, num_groups: int, eps: float = 1e-5, gamma=None, beta=None):
    """GroupNorm over NHWC. num_groups=1 == (affine-optional) LayerNorm over
    C,H,W as used by LGD's ``get_norm`` (reference dynamic_teacher/layers.py:6)."""
    b, h, w, c = x.shape
    assert c % num_groups == 0
    xg = x.reshape(b, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) / jnp.sqrt(var + eps)
    x = xg.reshape(b, h, w, c)
    if gamma is not None:
        x = x * gamma
    if beta is not None:
        x = x + beta
    return x
