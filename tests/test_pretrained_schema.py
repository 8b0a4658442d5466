"""Pretrained-import schema coverage: generate the COMPLETE key set of the
real checkpoint formats the reference configs point at (MODEL.WEIGHTS:
Caffe2 MSRA ImageNet pkls, detectron2-dotted trained checkpoints incl.
X-101-32x8d groups and DCNv2 offset convs, converted Swin-T pth) and prove
every tensor converts onto an actual module parameter with the right shape
— and that every module parameter is covered (no silent random init).
VERDICT r1 #10."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lgd_tpu.config import get_cfg
from lgd_tpu.utils.weight_convert import (
    convert_resnet_state,
    convert_swin_state,
)

R50_BLOCKS = (3, 4, 6, 3)
R101_BLOCKS = (3, 4, 23, 3)


def _flatten(tree, prefix=()):
    for k in sorted(tree):
        v = tree[k]
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _assert_bijective(converted, shape_tree, what):
    dst = {p: v for p, v in _flatten(shape_tree)}
    src = {p: v for p, v in _flatten(converted)}
    missing_dst = [p for p in src if p not in dst]
    assert not missing_dst, f"{what}: converted keys with no target: " \
                            f"{missing_dst[:8]}"
    bad = [(p, tuple(src[p].shape), tuple(dst[p].shape))
           for p in src if tuple(src[p].shape) != tuple(dst[p].shape)]
    assert not bad, f"{what}: shape mismatches: {bad[:8]}"
    uncovered = [p for p in dst if p not in src]
    assert not uncovered, f"{what}: module params never loaded: " \
                          f"{uncovered[:8]}"


# --------------------------------------------------------------------------
# fixture generators (exact real-checkpoint key schemas)
# --------------------------------------------------------------------------

def make_caffe2_imagenet_pkl_dict(blocks=R50_BLOCKS, width=64, groups=1):
    """Key-for-key Caffe2 MSRA ImageNet pkl schema (R-50.pkl etc.)."""
    d = {}
    z = lambda *s: np.zeros(s, np.float32)
    d["conv1_w"] = z(64, 3, 7, 7)
    for suf, n in (("_s", 64), ("_b", 64), ("_rm", 64), ("_riv", 64)):
        d["res_conv1_bn" + suf] = z(n)
    bw = groups * width
    in_ch = 64
    out_ch = 256
    for s, nb in enumerate(blocks, start=2):
        for b in range(nb):
            p = f"res{s}_{b}"
            if b == 0:
                d[f"{p}_branch1_w"] = z(out_ch, in_ch, 1, 1)
                for suf in ("_s", "_b", "_rm", "_riv"):
                    d[f"{p}_branch1_bn{suf}"] = z(out_ch)
            shapes = {
                "branch2a": (bw, in_ch if b == 0 else out_ch, 1, 1),
                "branch2b": (bw, bw // groups, 3, 3),
                "branch2c": (out_ch, bw, 1, 1),
            }
            for br, shape in shapes.items():
                d[f"{p}_{br}_w"] = z(*shape)
                for suf in ("_s", "_b", "_rm", "_riv"):
                    d[f"{p}_{br}_bn{suf}"] = z(shape[0])
        in_ch = out_ch
        out_ch *= 2
        bw *= 2
    d["fc1000_w"] = z(1000, 2048)
    d["fc1000_b"] = z(1000)
    return d


def make_d2_backbone_dict(blocks=R101_BLOCKS, width=8, groups=32,
                          deform=(False, True, True, True)):
    """detectron2-dotted trained-checkpoint backbone schema
    (backbone.bottom_up.*), X-101-32x8d + DCNv2 shapes."""
    d = {}
    z = lambda *s: np.zeros(s, np.float32)

    def bn(prefix, n):
        d[f"{prefix}.norm.weight"] = z(n)
        d[f"{prefix}.norm.bias"] = z(n)
        d[f"{prefix}.norm.running_mean"] = z(n)
        d[f"{prefix}.norm.running_var"] = z(n)

    P = "backbone.bottom_up."
    d[P + "stem.conv1.weight"] = z(64, 3, 7, 7)
    bn(P + "stem.conv1", 64)
    bw = groups * width
    in_ch, out_ch = 64, 256
    for si, nb in enumerate(blocks):
        s = si + 2
        for b in range(nb):
            p = f"{P}res{s}.{b}"
            if b == 0:
                d[f"{p}.shortcut.weight"] = z(out_ch, in_ch, 1, 1)
                bn(f"{p}.shortcut", out_ch)
            d[f"{p}.conv1.weight"] = z(bw, in_ch if b == 0 else out_ch, 1, 1)
            bn(f"{p}.conv1", bw)
            d[f"{p}.conv2.weight"] = z(bw, bw // groups, 3, 3)
            bn(f"{p}.conv2", bw)
            if deform[si]:
                d[f"{p}.conv2_offset.weight"] = z(27, bw, 3, 3)
                d[f"{p}.conv2_offset.bias"] = z(27)
            d[f"{p}.conv3.weight"] = z(out_ch, bw, 1, 1)
            bn(f"{p}.conv3", out_ch)
        in_ch = out_ch
        out_ch *= 2
        bw *= 2
    return d


def make_swin_t_dict():
    """Official converted Swin-T checkpoint schema (backbone.* dotted),
    incl. the buffers the converter must skip."""
    d = {}
    z = lambda *s: np.zeros(s, np.float32)
    depths = (2, 2, 6, 2)
    heads = (3, 6, 12, 24)
    C = 96
    d["backbone.patch_embed.proj.weight"] = z(C, 3, 4, 4)
    d["backbone.patch_embed.proj.bias"] = z(C)
    d["backbone.patch_embed.norm.weight"] = z(C)
    d["backbone.patch_embed.norm.bias"] = z(C)
    for li, (depth, nh) in enumerate(zip(depths, heads)):
        c = C * 2 ** li
        for b in range(depth):
            p = f"backbone.layers.{li}.blocks.{b}"
            for nrm in ("norm1", "norm2"):
                d[f"{p}.{nrm}.weight"] = z(c)
                d[f"{p}.{nrm}.bias"] = z(c)
            d[f"{p}.attn.relative_position_bias_table"] = z(169, nh)
            d[f"{p}.attn.relative_position_index"] = np.zeros(
                (49, 49), np.int64)  # buffer -> skipped
            d[f"{p}.attn.qkv.weight"] = z(3 * c, c)
            d[f"{p}.attn.qkv.bias"] = z(3 * c)
            d[f"{p}.attn.proj.weight"] = z(c, c)
            d[f"{p}.attn.proj.bias"] = z(c)
            d[f"{p}.mlp.fc1.weight"] = z(4 * c, c)
            d[f"{p}.mlp.fc1.bias"] = z(4 * c)
            d[f"{p}.mlp.fc2.weight"] = z(c, 4 * c)
            d[f"{p}.mlp.fc2.bias"] = z(c)
        if li < 3:
            d[f"backbone.layers.{li}.downsample.reduction.weight"] = z(
                2 * c, 4 * c)
            d[f"backbone.layers.{li}.downsample.norm.weight"] = z(4 * c)
            d[f"backbone.layers.{li}.downsample.norm.bias"] = z(4 * c)
    for i in range(4):
        d[f"backbone.norm{i}.weight"] = z(C * 2 ** i)
        d[f"backbone.norm{i}.bias"] = z(C * 2 ** i)
    return d


# --------------------------------------------------------------------------
# shape trees of the actual modules
# --------------------------------------------------------------------------

def _resnet_shape_tree(depth, groups=1, width=64, deform=None):
    from lgd_tpu.models.backbones.resnet import ResNet

    m = ResNet(depth=depth, num_groups=groups, width_per_group=width,
               out_features=("res2", "res3", "res4", "res5"),
               deform_on_per_stage=tuple(deform or (False,) * 4),
               deform_modulated=True, dtype=jnp.float32)
    v = jax.eval_shape(
        lambda x: m.init(jax.random.PRNGKey(0), x),
        jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32))
    return v


def _swin_shape_tree():
    from lgd_tpu.models.backbones.swin import build_swint

    cfg = get_cfg()
    cfg.MODEL.SWINT.OUT_FEATURES = ["stage2", "stage3", "stage4", "stage5"]
    cfg.freeze()
    m = build_swint(cfg, dtype=jnp.float32).clone(name=None)
    return jax.eval_shape(
        lambda x: m.init(jax.random.PRNGKey(0), x),
        jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32))


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------

def test_caffe2_r50_schema_full_coverage():
    raw = make_caffe2_imagenet_pkl_dict()
    conv = convert_resnet_state(raw)
    tree = _resnet_shape_tree(50)
    _assert_bijective(conv["params"], tree["params"], "R50 params")
    _assert_bijective(conv["frozen"], tree["frozen"], "R50 frozen")


def test_d2_x101_dcnv2_schema_full_coverage():
    raw = make_d2_backbone_dict()
    conv = convert_resnet_state(raw)
    tree = _resnet_shape_tree(101, groups=32, width=8,
                              deform=(False, True, True, True))
    _assert_bijective(conv["params"], tree["params"], "X101 params")
    _assert_bijective(conv["frozen"], tree["frozen"], "X101 frozen")


def test_swin_t_schema_full_coverage():
    raw = make_swin_t_dict()
    conv = convert_swin_state(raw)
    tree = _swin_shape_tree()
    _assert_bijective(conv["params"], tree["params"], "SwinT params")
