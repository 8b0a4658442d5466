"""Shared NN building blocks (Flax linen, NHWC, TPU-friendly).

Equivalents of the detectron2 layer zoo the reference depends on
(SURVEY.md L1): Conv2d+norm wrappers, FrozenBatchNorm, GroupNorm, and the
per-level learnable ``Scale`` (reference thirdparty_heads/scale.py:10-16).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class FrozenBatchNorm(nn.Module):
    """BatchNorm with constant affine + running stats (detectron2
    ``FrozenBatchNorm2d``): the ImageNet-pretrained ResNet statistics are
    baked in and never updated. Stored in the ``frozen`` collection so they
    are excluded from optimization and gradient computation."""

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shape = (self.features,)
        scale = self.variable("frozen", "scale", nn.initializers.ones, None, shape)
        bias = self.variable("frozen", "bias", nn.initializers.zeros, None, shape)
        mean = self.variable("frozen", "mean", nn.initializers.zeros, None, shape)
        var = self.variable("frozen", "var", nn.initializers.ones, None, shape)
        # fold into a single scale/shift (XLA fuses into the preceding conv)
        w = scale.value / jnp.sqrt(var.value + self.eps)
        b = bias.value - mean.value * w
        return x * w.astype(x.dtype) + b.astype(x.dtype)


class GroupNorm32(nn.Module):
    """GroupNorm(32) as used by FCOS towers (fcos.py:462)."""

    features: int
    num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=1e-5, dtype=jnp.float32
        )(x).astype(x.dtype)


def get_norm(norm: str, features: int, dtype=jnp.float32,
             name: Optional[str] = None) -> Optional[nn.Module]:
    if norm in (None, "", "none"):
        return None
    if norm == "FrozenBN":
        return FrozenBatchNorm(features, dtype=dtype, name=name)
    if norm == "GN":
        return GroupNorm32(features, dtype=dtype, name=name)
    raise ValueError(f"Unknown norm: {norm}")


class Conv(nn.Module):
    """Conv2d with optional norm/activation, NHWC. Weight layout HWIO."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: Any = "SAME"
    use_bias: bool = True
    norm: str = ""
    activation: Optional[Callable] = None
    kernel_init: Callable = nn.initializers.he_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Dtype = jnp.float32
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=self.padding,
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        norm = get_norm(self.norm, self.features, dtype=self.dtype)
        if norm is not None:
            x = norm(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class Scale(nn.Module):
    """Learnable scalar multiplier (reference thirdparty_heads/scale.py)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param(
            "scale", lambda k: jnp.asarray(self.init_value, jnp.float32)
        )
        return x * s.astype(x.dtype)


def normal_init(std: float):
    return nn.initializers.normal(stddev=std)


def constant_init(v: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, v, dtype)

    return init


def feature_strides(cfg, names):
    """Stride of each named feature map. FPN levels are fixed powers of two;
    raw ResNet stages depend on RES5_DILATION (DilatedC5 keeps res5 at
    stride 16, detectron2 build_resnet_backbone semantics)."""
    res5 = 32 // max(int(cfg.MODEL.RESNETS.RES5_DILATION), 1)
    table = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64, "p7": 128,
             "res2": 4, "res3": 8, "res4": 16, "res5": res5,
             "stage2": 4, "stage3": 8, "stage4": 16, "stage5": 32}
    return [table[n] for n in names]
