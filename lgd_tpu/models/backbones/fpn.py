"""Feature Pyramid Network (Flax, NHWC).

Equivalent of detectron2 ``FPN`` + ``LastLevelMaxPool`` / ``LastLevelP6P7``
tops, which the reference uses for every student (SURVEY.md L3; Swin FPN
builders at swin_transformer.py:665-732). Kept as a separate module from the
bottom-up so the distillator can freeze/inspect them independently, mirroring
the reference's raw_backbone/fpn split (retinanet.py:31-34).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _upsample_nearest_2x(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    """Builds {p_min..p_max} from bottom-up features.

    in_features: bottom-up keys in increasing stride order (e.g.
        ['res3','res4','res5']).
    in_strides: matching strides (e.g. [8,16,32]).
    top_block: None | 'maxpool' (RCNN p6) | 'p6p7' (RetinaNet/FCOS).
    top_block_in_feature: 'res5'/'p5' source for the p6p7 block
        (detectron2 RetinaNet uses res5; Swin-RetinaNet uses p5).
    """

    in_features: Sequence[str]
    in_strides: Sequence[int]
    out_channels: int = 256
    top_block: Optional[str] = "p6p7"
    top_block_in_feature: str = "res5"
    fuse_type: str = "sum"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, bottom_up: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        feats = [bottom_up[f] for f in self.in_features]

        c2x = nn.initializers.glorot_uniform()
        laterals = [
            nn.Conv(self.out_channels, (1, 1), use_bias=True, dtype=self.dtype,
                    kernel_init=c2x, name=f"lateral_{f}")(x)
            for f, x in zip(self.in_features, feats)
        ]

        # top-down pathway
        merged = [None] * len(laterals)
        merged[-1] = laterals[-1]
        for i in range(len(laterals) - 2, -1, -1):
            up = _upsample_nearest_2x(merged[i + 1])
            merged[i] = laterals[i] + up
            if self.fuse_type == "avg":
                merged[i] = merged[i] * 0.5

        outputs = {}
        lowest_level = {4: 2, 8: 3, 16: 4, 32: 5}[self.in_strides[0]]
        for i, m in enumerate(merged):
            level = lowest_level + i
            outputs[f"p{level}"] = nn.Conv(
                self.out_channels, (3, 3), padding="SAME", use_bias=True,
                dtype=self.dtype, kernel_init=c2x, name=f"output_p{level}")(m)

        last_level = lowest_level + len(merged) - 1
        if self.top_block == "maxpool":
            p = outputs[f"p{last_level}"]
            outputs[f"p{last_level + 1}"] = nn.max_pool(
                p, (1, 1), strides=(2, 2))
        elif self.top_block == "p6p7":
            src = (
                bottom_up[self.top_block_in_feature]
                if self.top_block_in_feature in bottom_up
                else outputs[self.top_block_in_feature]
            )
            # explicit symmetric pad=1, NOT "SAME": for stride 2 on
            # even-sized inputs flax SAME pads (0, 1) while detectron2's
            # Conv2d(3, stride=2, padding=1) pads (1, 1) — a 1 px window
            # shift that breaks parity with converted reference weights
            p6 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                         padding=[(1, 1), (1, 1)], dtype=self.dtype,
                         kernel_init=c2x, name="top_p6")(src)
            p7 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                         padding=[(1, 1), (1, 1)], dtype=self.dtype,
                         kernel_init=c2x, name="top_p7")(nn.relu(p6))
            outputs[f"p{last_level + 1}"] = p6
            outputs[f"p{last_level + 2}"] = p7
        elif self.top_block not in (None, "", "none"):
            raise ValueError(self.top_block)
        return outputs


def fpn_output_strides(in_strides: Sequence[int], top_block: Optional[str]):
    lowest = {4: 2, 8: 3, 16: 4, 32: 5}[in_strides[0]]
    n = len(in_strides)
    strides = {f"p{lowest + i}": in_strides[0] * (2 ** i) for i in range(n)}
    last = lowest + n - 1
    if top_block == "maxpool":
        strides[f"p{last + 1}"] = strides[f"p{last}"] * 2
    elif top_block == "p6p7":
        strides[f"p{last + 1}"] = strides[f"p{last}"] * 2
        strides[f"p{last + 2}"] = strides[f"p{last}"] * 4
    return strides
