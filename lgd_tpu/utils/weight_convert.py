"""Pretrained-weight import: detectron2 pkl / torch state_dicts -> param tree.

Equivalent of DetectionCheckpointer's cold-start path (train.py:159-161
loading ``detectron2://ImageNetPretrained/MSRA/R-50.pkl`` etc.). Supports:

- detectron2-converted pkls ({"model": {name: ndarray}} with either
  detectron2-style names ``backbone.bottom_up.res2.0.conv1.*`` or Caffe2
  names ``res2_0_branch2a_*``),
- plain torch ``state_dict`` files (torchvision resnets / converted Swin).

Weights are transposed OIHW -> HWIO for NHWC Flax convs; BN stats land in
the ``frozen`` collection. Missing files are skipped with a warning (this
container has no network egress), leaving random init.
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import Dict

import numpy as np

logger = logging.getLogger(__name__)

_BRANCH = {"branch1": "shortcut", "branch2a": "conv1",
           "branch2b": "conv2", "branch2c": "conv3"}


def _load_raw(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        model = data.get("model", data)
        return {k: np.asarray(v) for k, v in model.items()
                if isinstance(v, np.ndarray) or hasattr(v, "shape")}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def _c2_to_d2_name(k: str) -> str:
    """Caffe2 ImageNet-pkl names -> detectron2-ish dotted names
    (e.g. res2_0_branch2a_bn_s -> res2.0.conv1.norm.weight)."""
    import re

    k = re.sub(r"_bn_s$", "_bn.weight", k)
    k = re.sub(r"_bn_b$", "_bn.bias", k)
    k = re.sub(r"_bn_rm$", "_bn.running_mean", k)
    k = re.sub(r"_bn_riv$", "_bn.running_var", k)
    k = re.sub(r"_w$", ".weight", k)
    k = re.sub(r"_b$", ".bias", k)
    k = k.replace("_bn.", ".norm.")
    if k.startswith("conv1.") or k.startswith("res_conv1"):
        k = "stem." + k.replace("res_conv1", "conv1")
    for br, name in _BRANCH.items():
        k = k.replace("_" + br, "." + name)
    # res2_0.conv1... -> res2.0.conv1...
    k = re.sub(r"^res(\d)_(\d+)\.", r"res\1.\2.", k)
    return k


def convert_resnet_state(raw: Dict[str, np.ndarray]) -> Dict:
    """Build {params, frozen} subtrees for our ResNet module from a
    detectron2/caffe2-style dict. Returns flat {'params': {...}, 'frozen':
    {...}} keyed by our module names (stem_conv1, res2_0, ...)."""
    named = {}
    for k, v in raw.items():
        if "." not in k or k.startswith(("fc", "linear")):
            if k.startswith(("fc", "linear")):
                continue
            k = _c2_to_d2_name(k)
        k = k.replace("backbone.bottom_up.", "")
        named[k] = v

    params, frozen = {}, {}

    def put(tree, path, arr):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr

    # our module layout: params[stem_conv1|res{s}_{b}/{convX,shortcut}]/kernel
    # and frozen[...{convX}_norm]/{scale,bias,mean,var}
    for k, v in named.items():
        parts = k.split(".")
        if parts[0] == "stem" and len(parts) >= 2:
            block = None
            conv_name = "stem_conv1"
            tail = parts[2:]  # after 'stem.conv1'
        elif parts[0].startswith("res") and len(parts) >= 3:
            block = f"{parts[0]}_{parts[1]}"
            conv_name = parts[2]
            tail = parts[3:]
        else:
            continue
        prefix = [block] if block else []
        if conv_name.endswith("_offset"):
            # DCNv2 offset/mask predictor (detectron2 res{s}.{b}.conv2_offset
            # in DEFORM_ON_PER_STAGE checkpoints) -> our
            # res{s}_{b}/conv2/offset_conv
            base = conv_name[: -len("_offset")]
            if tail and tail[0] == "weight" and v.ndim == 4:
                put(params, prefix + [base, "offset_conv", "kernel"],
                    v.transpose(2, 3, 1, 0).astype(np.float32))
            elif tail and tail[0] == "bias":
                put(params, prefix + [base, "offset_conv", "bias"],
                    v.astype(np.float32))
            continue
        if tail and tail[0] == "norm" and len(tail) >= 2:
            stat = {"weight": "scale", "bias": "bias",
                    "running_mean": "mean", "running_var": "var"}[tail[1]]
            put(frozen, prefix + [f"{conv_name}_norm", stat],
                v.astype(np.float32))
        elif tail and tail[0] == "weight" and v.ndim == 4:
            w = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            put(params, prefix + [conv_name, "kernel"], w.astype(np.float32))
    return {"params": params, "frozen": frozen}


def convert_swin_state(raw: Dict[str, np.ndarray]) -> Dict:
    """Converted Swin .pth (timm/official layout, as referenced by
    MODEL.WEIGHTS 'swin_tiny_patch4_window7_224_converted.pth') -> our
    SwinTransformer param tree. Linear (out,in) -> Dense kernel (in,out);
    conv OIHW -> HWIO."""
    params: Dict = {}

    def put(path, arr):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(arr, np.float32)

    for k, v in raw.items():
        k = k.replace("backbone.", "")
        parts = k.split(".")
        if parts[0] == "absolute_pos_embed":
            # (1, C, Hp, Wp) buffer -> our NHWC (1, Hp, Wp, C) param
            put(["absolute_pos_embed"], np.transpose(v, (0, 2, 3, 1)))
        elif parts[0] == "patch_embed":
            if parts[1] == "proj":
                if parts[2] == "weight":
                    put(["patch_embed", "kernel"], v.transpose(2, 3, 1, 0))
                else:
                    put(["patch_embed", "bias"], v)
            elif parts[1] == "norm":
                put(["patch_norm", "scale" if parts[2] == "weight" else "bias"], v)
        elif parts[0] == "layers" and parts[2] == "blocks":
            stage = int(parts[1]) + 2
            blk = f"stage{stage}_block{parts[3]}"
            rest = parts[4:]
            if rest[0] in ("norm1", "norm2"):
                put([blk, rest[0], "scale" if rest[1] == "weight" else "bias"], v)
            elif rest[0] == "attn":
                if rest[1] == "relative_position_bias_table":
                    put([blk, "attn", "relative_position_bias_table"], v)
                elif rest[1] in ("qkv", "proj"):
                    if rest[2] == "weight":
                        put([blk, "attn", rest[1], "kernel"], v.T)
                    else:
                        put([blk, "attn", rest[1], "bias"], v)
            elif rest[0] == "mlp":
                name = "mlp_fc1" if rest[1] == "fc1" else "mlp_fc2"
                if rest[2] == "weight":
                    put([blk, name, "kernel"], v.T)
                else:
                    put([blk, name, "bias"], v)
        elif parts[0] == "layers" and parts[2] == "downsample":
            stage = int(parts[1]) + 2
            ds = f"stage{stage}_downsample"
            if parts[3] == "norm":
                put([ds, "norm", "scale" if parts[4] == "weight" else "bias"], v)
            elif parts[3] == "reduction":
                put([ds, "reduction", "kernel"], v.T)
        elif parts[0].startswith("norm") and len(parts[0]) > 4:
            # out-feature norms: norm0..norm3 -> stage{2..5}_norm
            stage = int(parts[0][4:]) + 2
            put([f"stage{stage}_norm",
                 "scale" if parts[1] == "weight" else "bias"], v)
    return {"params": params, "frozen": {}}


def _merge_into(dst, src, prefix=""):
    """Copy matching-shaped leaves of src into dst (dicts), warn otherwise."""
    n_ok = n_miss = 0
    for k, v in src.items():
        name = f"{prefix}.{k}" if prefix else k
        if k not in dst:
            n_miss += 1
            logger.debug("no target for %s", name)
            continue
        if isinstance(v, dict):
            a, b = _merge_into(dst[k], v, name)
            n_ok += a
            n_miss += b
        else:
            if tuple(dst[k].shape) == tuple(v.shape):
                dst[k] = v.astype(np.asarray(dst[k]).dtype)
                n_ok += 1
            else:
                n_miss += 1
                logger.warning("shape mismatch for %s: %s vs %s",
                               name, dst[k].shape, v.shape)
    return n_ok, n_miss


def maybe_load_pretrained(cfg, state):
    """Load cfg.MODEL.WEIGHTS into state.params['student']['bottom_up'] /
    state.frozen if the file exists locally; otherwise keep random init."""
    path = cfg.MODEL.WEIGHTS
    if not path:
        return state
    if path.startswith("detectron2://"):
        local = os.path.join("pretrained_backbones",
                             path.split("/")[-1])
        path = local
    if not os.path.exists(path):
        logger.warning(
            "Pretrained weights %s not found locally (no network egress); "
            "training from random init.", cfg.MODEL.WEIGHTS,
        )
        return state
    raw = _load_raw(path)
    is_swin = any("relative_position_bias_table" in k for k in raw)
    conv = convert_swin_state(raw) if is_swin else convert_resnet_state(raw)
    import jax

    params = jax.tree.map(np.asarray, jax.device_get(state.params))
    frozen = jax.tree.map(np.asarray, jax.device_get(state.frozen))
    ok_p, miss_p = _merge_into(
        params["student"]["bottom_up"], conv["params"])
    ok_f, miss_f = _merge_into(
        frozen.get("student", {}).get("bottom_up", {}), conv["frozen"])
    logger.info("Loaded pretrained: %d param tensors, %d frozen stats "
                "(%d unmatched)", ok_p, ok_f, miss_p + miss_f)
    import jax.numpy as jnp

    return state.replace(
        params=jax.tree.map(jnp.asarray, params),
        frozen=jax.tree.map(jnp.asarray, frozen),
    )
