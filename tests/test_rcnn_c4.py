"""C4 / DilatedC5 R-CNN variants (reference config surface:
/root/reference/configs/Base-RCNN-C4.yaml and Base-RCNN-DilatedC5.yaml).
Both must build and trace a full train-time predict() and inference."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgd_tpu.config import FrozenCfg, get_cfg
from lgd_tpu.data import make_synthetic_batch
from lgd_tpu.models.rcnn.rcnn import RCNNCT

REF = "/root/reference/configs"


def _cfg(base_yaml, extra=()):
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REF, base_yaml))
    cfg.merge_from_list([
        "MODEL.RESNETS.DEPTH", "50",
        "MODEL.RPN.POST_NMS_TOPK_TRAIN", "32",
        "MODEL.RPN.PRE_NMS_TOPK_TRAIN", "64",
        "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "16",
        "TPU.MAX_INSTANCES", "6",
    ] + list(extra))
    cfg.freeze()
    return FrozenCfg(cfg)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference absent")
@pytest.mark.parametrize("yaml,roi_name", [
    ("Base-RCNN-C4.yaml", "Res5ROIHeads"),
    ("Base-RCNN-DilatedC5.yaml", "StandardROIHeads"),
])
def test_c4_dilatedc5_trace(yaml, roi_name):
    cfg = _cfg(yaml)
    assert cfg.MODEL.ROI_HEADS.NAME == roi_name
    model = RCNNCT(cfg=cfg, dtype=jnp.float32)
    batch = make_synthetic_batch(batch_size=1, canvas_hw=(64, 64),
                                 max_instances=6, seed=0)

    out = jax.eval_shape(
        lambda img, sz, gt: model.init(
            {"params": jax.random.PRNGKey(0),
             "sampling": jax.random.PRNGKey(1)},
            img, sz, gt, method=model.init_all),
        batch["image"], batch["image_size"], batch["gt"],
    )
    params = out["params"]
    if roi_name == "Res5ROIHeads":
        assert "res5_0" in params["roi_heads"], list(params["roi_heads"])
        assert "fpn" not in params, list(params)
        # C4 trunk must stop at res4 (res5 lives in the ROI heads)
        assert not any(k.startswith("res5") for k in params["bottom_up"])
    else:
        # DilatedC5: res5 exists in the trunk, still no FPN
        assert any(k.startswith("res5") for k in params["bottom_up"])
        assert "fpn" not in params, list(params)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference absent")
def test_c4_executes_train_and_inference():
    cfg = _cfg("Base-RCNN-C4.yaml", ["MODEL.RPN.POST_NMS_TOPK_TEST", "16",
                                     "MODEL.RPN.PRE_NMS_TOPK_TEST", "32"])
    model = RCNNCT(cfg=cfg, dtype=jnp.float32)
    batch = make_synthetic_batch(batch_size=1, canvas_hw=(64, 64),
                                 max_instances=6, seed=0)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch["image"], batch["image_size"], batch["gt"],
        method=model.init_all)
    losses = model.apply(
        variables, batch["image"], batch["image_size"], batch["gt"],
        method=model.init_all, rngs={"sampling": jax.random.PRNGKey(2)})
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    assert {"loss_rpn_cls", "loss_rpn_loc", "loss_cls",
            "loss_box_reg"} <= set(losses)

    def infer(variables, image, image_size):
        raw, feats = model.apply(variables, image, image_size)
        return model.apply(variables, feats, image_size,
                           method=model.infer_boxes,
                           rngs={"sampling": jax.random.PRNGKey(3)})

    dets, _ = infer(variables, batch["image"], batch["image_size"])
    assert dets.boxes.shape[-1] == 4

@pytest.mark.skipif(not os.path.isdir(REF), reason="reference absent")
def test_dilatedc5_res5_stride_16():
    cfg = _cfg("Base-RCNN-DilatedC5.yaml")
    model = RCNNCT(cfg=cfg, dtype=jnp.float32)
    batch = make_synthetic_batch(batch_size=1, canvas_hw=(64, 64),
                                 max_instances=6, seed=0)
    shapes = jax.eval_shape(
        lambda img, sz: model.init(
            {"params": jax.random.PRNGKey(0)}, img, sz),
        batch["image"], batch["image_size"],
    )
    # init returns variables; run apply shapes via __call__ output instead
    out = jax.eval_shape(
        lambda v, img, sz: model.apply(v, img, sz),
        shapes, batch["image"], batch["image_size"],
    )
    raw, feats = out
    assert feats["res5"].shape[1] == 64 // 16  # dilation keeps stride 16
