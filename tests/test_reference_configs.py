"""Every reference distillation YAML must build a model; representative
configs (one per family + each special backbone) must trace a full LGD
training forward on a tiny canvas (BASELINE.json: 'reference configs run
unchanged')."""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from lgd_tpu.config import get_cfg
from lgd_tpu.data import make_synthetic_batch
from lgd_tpu.models.distillator import build_model

REF = "/root/reference/configs/Distillation"

ALL_YAMLS = sorted(glob.glob(os.path.join(REF, "**", "*.yaml"),
                             recursive=True))

def _trace_opts(path):
    """Per-config overrides for the full-graph trace: backbones stay REAL
    (X-101 groups, DCNv2, Swin, true depths — eval_shape never executes, so
    tracing the genuine architecture is cheap); only proposal/sampling
    capacities are reduced to keep the tiny-canvas R-CNN trace small."""
    name = os.path.basename(path)
    opts = []
    if "rcnn" in name:
        opts += ["MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "32",
                 "MODEL.RPN.POST_NMS_TOPK_TRAIN", "64"]
    return opts


def _load(path, extra_opts=()):
    cfg = get_cfg()
    cfg.merge_from_file(path)
    if "Distillator" not in cfg.MODEL.META_ARCHITECTURE:
        cfg.MODEL.META_ARCHITECTURE = "Distillator" + cfg.MODEL.META_ARCHITECTURE
    cfg.merge_from_list(list(extra_opts) + ["TPU.MAX_INSTANCES", "6"])
    cfg.freeze()
    return cfg


@pytest.mark.skipif(not ALL_YAMLS, reason="reference absent")
@pytest.mark.parametrize("path", ALL_YAMLS, ids=lambda p: os.path.basename(p)[:40])
def test_build_model_from_reference_config(path):
    cfg = _load(path)
    model = build_model(cfg, dtype=jnp.float32)
    assert model is not None
    assert cfg.MODEL.DISTILLATOR.STUDENT.META_ARCH in (
        "RetinaNetCT", "FCOSCT", "ATSSCT", "POTOCT", "RCNNCT")


@pytest.mark.skipif(not ALL_YAMLS, reason="reference absent")
@pytest.mark.parametrize("path", ALL_YAMLS,
                         ids=lambda p: os.path.basename(p)[:40])
def test_trace_train_forward(path):
    cfg = _load(path, _trace_opts(path))
    model = build_model(cfg, dtype=jnp.float32)
    with_masks = cfg.MODEL.DISTILLATOR.LABEL_ENCODER.LOAD_LABELMAP
    batch = make_synthetic_batch(batch_size=1, canvas_hw=(64, 64),
                                 max_instances=6, seed=0,
                                 with_masks=with_masks)
    # eval_shape traces the full distillation graph without running it
    out = jax.eval_shape(
        lambda img, sz, gt: model.init(
            {"params": jax.random.PRNGKey(0),
             "sampling": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            img, sz, gt, jnp.float32(1.0), jnp.float32(100.0),
            method=model.train_forward),
        batch["image"], batch["image_size"], batch["gt"],
    )
    assert "params" in out
