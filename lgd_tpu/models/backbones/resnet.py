"""ResNet / ResNeXt bottom-up backbone (Flax, NHWC, bf16 compute).

TPU-native re-implementation of the detectron2 ResNet family the reference
students use (SURVEY.md L3; configs select R-50/R-101/X-101-32x8d with
optional DCNv2 on stages res3-res5, e.g. configs/Distillation/RetinaNet/
retinanet_X_101_dcnv2_*.yaml:7-12). Architectural contract kept so
detectron2 ImageNet pkl weights convert 1:1:

- stem: 7x7/2 conv + FrozenBN + relu + 3x3/2 maxpool
- stages res2..res5 of bottleneck blocks; first block of each stage has a
  1x1 projection shortcut; stride lives in the 1x1 when STRIDE_IN_1X1
  (Caffe-style, detectron2 default), else in the 3x3
- NUM_GROUPS/WIDTH_PER_GROUP parameterize ResNeXt
- DEFORM_ON_PER_STAGE swaps the 3x3 for modulated deformable conv (DCNv2)
- FREEZE_AT handled outside the module via optimizer param masks (grads of
  frozen stages are structurally discarded), matching detectron2 freezing.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..layers import get_norm
from ...ops.deform_conv import deform_conv2d_params

_STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class BottleneckBlock(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    num_groups: int = 1
    norm: str = "FrozenBN"
    stride_in_1x1: bool = True
    dilation: int = 1
    deform_modulated: bool = False
    use_deform: bool = False
    dcn_impl: str = "dense"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        stride_1x1, stride_3x3 = (
            (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        )

        def conv(x, feat, k, s, name, groups=1, dil=1):
            x = nn.Conv(feat, (k, k), strides=(s, s),
                        padding=[(dil * (k // 2),) * 2] * 2,
                        kernel_dilation=(dil, dil),
                        feature_group_count=groups, use_bias=False,
                        dtype=self.dtype, name=name)(x)
            norm = get_norm(self.norm, feat, dtype=self.dtype,
                            name=f"{name}_norm")
            return norm(x) if norm is not None else x

        shortcut = x
        if in_channels != self.out_channels or self.stride != 1:
            shortcut = conv(x, self.out_channels, 1, self.stride, "shortcut")

        out = nn.relu(conv(x, self.bottleneck_channels, 1, stride_1x1, "conv1"))
        if self.use_deform:
            out = DeformConvUnit(
                features=self.bottleneck_channels,
                strides=stride_3x3,
                dilation=self.dilation,
                groups=self.num_groups,
                modulated=self.deform_modulated,
                impl=self.dcn_impl,
                norm="none",  # norm applied at block level (uniform
                # conv2_norm naming across plain/deform blocks, so the
                # detectron2 res{s}.{b}.conv2.norm.* keys convert 1:1)
                dtype=self.dtype,
                name="conv2",
            )(out)
            norm2 = get_norm(self.norm, self.bottleneck_channels,
                             dtype=self.dtype, name="conv2_norm")
            if norm2 is not None:
                out = norm2(out)
            out = nn.relu(out)
        else:
            out = nn.relu(
                conv(out, self.bottleneck_channels, 3, stride_3x3, "conv2",
                     groups=self.num_groups, dil=self.dilation)
            )
        out = conv(out, self.out_channels, 1, 1, "conv3")
        return nn.relu(out + shortcut)


class DeformConvUnit(nn.Module):
    """3x3 (modulated) deformable conv + norm: offsets/masks predicted by a
    zero-initialized conv, sampling via the gather-based DCNv2 op
    (lgd_tpu.ops.deform_conv; TPU equivalent of detectron2 deform_conv.cu)."""

    features: int
    strides: int = 1
    dilation: int = 1
    groups: int = 1
    modulated: bool = True
    impl: str = "dense"
    norm: str = "FrozenBN"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        k = 3
        off_ch = (3 if self.modulated else 2) * k * k
        # offset conv stays f32 end-to-end: an A/B with bf16 compute dtype
        # measured NO step-time change (302 vs 301 ms, R-101-DCNv2 batch 8
        # — XLA already fuses the converts), so exact offsets are free
        offset_mask = nn.Conv(
            off_ch, (k, k), strides=(self.strides, self.strides),
            padding=[(self.dilation,) * 2] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=jnp.float32, name="offset_conv")(x.astype(jnp.float32))
        if self.modulated:
            offsets = offset_mask[..., : 2 * k * k]
            mask = nn.sigmoid(offset_mask[..., 2 * k * k :])
        else:
            offsets, mask = offset_mask, None
        weight = self.param(
            "kernel", nn.initializers.he_normal(),
            (k, k, x.shape[-1] // self.groups, self.features), jnp.float32)
        out = deform_conv2d_params(
            x, weight, offsets, mask,
            stride=self.strides, dilation=self.dilation, groups=self.groups,
            dtype=self.dtype, impl=self.impl)
        norm = get_norm(self.norm, self.features, dtype=self.dtype,
                        name="norm")
        return norm(out) if norm is not None else out


class ResNet(nn.Module):
    """Returns a dict of requested stage outputs {'res2'..'res5'} plus
    always the last stage. Channels: res2..res5 = 256,512,1024,2048."""

    depth: int = 50
    num_groups: int = 1
    width_per_group: int = 64
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = True
    res5_dilation: int = 1
    norm: str = "FrozenBN"
    out_features: Sequence[str] = ("res3", "res4", "res5")
    deform_on_per_stage: Sequence[bool] = (False, False, False, False)
    deform_modulated: bool = False
    dcn_impl: str = "auto"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # `deterministic` (the train flag, threaded by the CT students):
        # ResNet has no stochastic layers, but DCN_IMPL='auto' routes the
        # deformable conv to the fast fused path in training and the
        # exact-for-any-offset gather path at eval (the dense/pallas paths
        # clamp |dy| > 6 feature px — ops/deform_conv.py:22-29). On a TPU
        # backend training uses the Pallas fused forward (gradients are the
        # dense path's exact VJP; measured 250.7 vs 272.1 ms/step on the
        # R-101-DCNv2 row); elsewhere (CPU tests) the dense matmul path.
        dcn_impl = self.dcn_impl
        if dcn_impl == "auto":
            if deterministic:
                dcn_impl = "gather"
            else:
                from ...ops.deform_conv import _on_tpu_backend

                dcn_impl = "pallas" if _on_tpu_backend() else "dense"
        x = x.astype(self.dtype)
        # stem
        x = nn.Conv(self.stem_out_channels, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, name="stem_conv1")(x)
        norm = get_norm(self.norm, self.stem_out_channels, dtype=self.dtype,
                        name="stem_conv1_norm")
        if norm is not None:
            x = norm(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        blocks_per_stage = _STAGE_BLOCKS[self.depth]
        bottleneck = self.num_groups * self.width_per_group
        out_channels = self.res2_out_channels
        outputs = {}
        # build only through the deepest requested stage: the C4 trunk ends
        # at res4 (detectron2 build_resnet_backbone with OUT_FEATURES
        # ['res4']; res5 then lives inside Res5ROIHeads)
        last_stage = max(int(f[3]) for f in self.out_features) - 1
        for stage_idx in range(last_stage):
            name = f"res{stage_idx + 2}"
            dilation = self.res5_dilation if stage_idx == 3 else 1
            first_stride = 1 if stage_idx == 0 or dilation > 1 else 2
            for block_idx in range(blocks_per_stage[stage_idx]):
                x = BottleneckBlock(
                    out_channels=out_channels,
                    bottleneck_channels=bottleneck,
                    stride=first_stride if block_idx == 0 else 1,
                    num_groups=self.num_groups,
                    norm=self.norm,
                    stride_in_1x1=self.stride_in_1x1,
                    dilation=dilation,
                    use_deform=self.deform_on_per_stage[stage_idx],
                    deform_modulated=self.deform_modulated,
                    dcn_impl=dcn_impl,
                    dtype=self.dtype,
                    name=f"{name}_{block_idx}",
                )(x)
            if name in self.out_features:
                outputs[name] = x
            bottleneck *= 2
            out_channels *= 2
        return outputs

    @staticmethod
    def out_channels_for(depth: int, res2_out: int = 256):
        return {f"res{i+2}": res2_out * (2 ** i) for i in range(4)}

    @staticmethod
    def strides():
        return {"res2": 4, "res3": 8, "res4": 16, "res5": 32}


def build_resnet(cfg, dtype=jnp.bfloat16) -> ResNet:
    r = cfg.MODEL.RESNETS
    return ResNet(
        depth=r.DEPTH,
        num_groups=r.NUM_GROUPS,
        width_per_group=r.WIDTH_PER_GROUP,
        stem_out_channels=r.STEM_OUT_CHANNELS,
        res2_out_channels=r.RES2_OUT_CHANNELS,
        stride_in_1x1=r.STRIDE_IN_1X1,
        res5_dilation=r.RES5_DILATION,
        norm=r.NORM,
        out_features=tuple(r.OUT_FEATURES),
        deform_on_per_stage=tuple(r.DEFORM_ON_PER_STAGE),
        deform_modulated=r.DEFORM_MODULATED,
        dcn_impl=cfg.TPU.DCN_IMPL,
        dtype=dtype,
        name="bottom_up",
    )
