"""Data-parallel evaluation parity: do_test over the 8-device CPU mesh
(batched, sharded inference) must produce the same detections as the
sequential batch-1 path (the reference's 8-GPU InferenceSampler eval,
utils/build.py:369-412; VERDICT r1 #4)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgd_tpu.config import get_cfg
from lgd_tpu.engine.trainer import do_test
from lgd_tpu.models.distillator import build_model


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "DistillatorRetinaNet"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.DATASETS.TEST = ("synthetic_mini",)
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.TPU.PAD_SIZE_DIVISIBILITY = 32
    cfg.TPU.MAX_INSTANCES = 8
    cfg.TPU.ATTENTION_IMPL = "reference"
    # random-init probs sit near PRIOR_PROB=0.01; keep plenty of detections
    cfg.MODEL.RETINANET.SCORE_THRESH_TEST = 0.003
    cfg.TEST.DETECTIONS_PER_IMAGE = 20
    cfg.OUTPUT_DIR = str(tmp_path_factory.mktemp("eval_parity"))
    cfg.freeze()

    model = build_model(cfg, dtype=jnp.float32)
    from lgd_tpu.data import make_synthetic_batch

    batch = make_synthetic_batch(batch_size=1, canvas_hw=(64, 96),
                                 max_instances=8, seed=0)
    variables = model.init(
        jax.random.PRNGKey(0), batch["image"], batch["image_size"],
        batch["gt"], False, method=model.inference)
    return cfg, model, variables


def _run(cfg, model, variables, batch_size, tag):
    out_dir = os.path.join(cfg.OUTPUT_DIR, tag)
    cfg2 = cfg.clone()
    cfg2.defrost()
    cfg2.OUTPUT_DIR = out_dir
    cfg2.freeze()
    results = do_test(cfg2, model, variables, batch_size=batch_size)
    with open(os.path.join(out_dir, "inference", "synthetic_mini",
                           "coco_instances_results.json")) as f:
        dets = json.load(f)
    return results, dets


def test_eval_batched_8dev_matches_batch1(setup):
    assert len(jax.devices()) >= 8, "conftest provides the 8-device mesh"
    cfg, model, variables = setup
    res1, dets1 = _run(cfg, model, variables, 1, "b1")
    res8, dets8 = _run(cfg, model, variables, 8, "b8")

    key = lambda d: (d["image_id"], -d["score"], d["category_id"])
    dets1 = sorted(dets1, key=key)
    dets8 = sorted(dets8, key=key)
    assert len(dets1) == len(dets8) > 0
    np.testing.assert_allclose(
        np.asarray([d["bbox"] for d in dets1]),
        np.asarray([d["bbox"] for d in dets8]), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray([d["score"] for d in dets1]),
        np.asarray([d["score"] for d in dets8]), atol=1e-4)
    assert [d["category_id"] for d in dets1] == \
           [d["category_id"] for d in dets8]
    for k in ("AP", "AP50", "AR@100"):
        np.testing.assert_allclose(res1["bbox"][k], res8["bbox"][k],
                                   atol=1e-3, err_msg=k)


def test_eval_after_capped_mesh_training(setup):
    """Regression (VERDICT r3 weak #1): when do_train capped the mesh
    (TPU.TRAIN_DEVICES / batch divisibility, trainer.py:195-209) the params
    are committed to an N<8-device mesh; the full-mesh AOT eval executable
    must not reject them ("Compiled object called with input sharding that
    does not match") — _get_infer device_puts onto the eval shardings."""
    cfg, model, variables = setup
    from lgd_tpu.parallel.mesh import make_mesh, replicated

    small = make_mesh(("data",), devices=jax.devices()[:1])
    v1 = jax.device_put(variables, replicated(small))
    jax.block_until_ready(v1)
    res, dets = _run(cfg, model, v1, 8, "capped1dev")
    assert "bbox" in res and len(dets) > 0
