"""Feature adapters applied to student FPN features before the distill loss
(reference models/adapters/sequential_convs.py:8-15, built via the adapter
registry build.py:10-17 and optimized with the *student* solver)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

ADAPTERS = {}


def register_adapter(name):
    def deco(cls):
        ADAPTERS[name] = cls
        return cls

    return deco


@register_adapter("SequentialConvs")
class SequentialConvs(nn.Module):
    """conv3x3 -> relu -> conv3x3 -> relu -> conv3x3 (shared across levels)."""

    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.channels, (3, 3), padding="SAME",
                            dtype=self.dtype, name="conv0")(x))
        x = nn.relu(nn.Conv(self.channels, (3, 3), padding="SAME",
                            dtype=self.dtype, name="conv1")(x))
        return nn.Conv(self.channels, (3, 3), padding="SAME",
                       dtype=self.dtype, name="conv2")(x)


def build_adapter(cfg, dtype=jnp.float32) -> nn.Module:
    name = cfg.MODEL.DISTILLATOR.ADAPTER.META_ARCH
    return ADAPTERS[name](channels=cfg.MODEL.FPN.OUT_CHANNELS, dtype=dtype,
                          name="adapter")
