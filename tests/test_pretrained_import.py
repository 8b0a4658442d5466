"""End-to-end pretrained import: a synthetic detectron2-style R-18 pkl is
written to disk and loaded through maybe_load_pretrained into a live
TrainState; loaded conv kernels and FrozenBN stats must land in the right
slots (the reference's DetectionCheckpointer cold-start, train.py:159-161)."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgd_tpu.config import get_cfg
from lgd_tpu.data import make_synthetic_batch
from lgd_tpu.engine import make_train_step
from lgd_tpu.models.distillator import build_model


def make_fake_r18_pkl(path, rng):
    """Caffe2-style names for the stem + first res2 block (enough to prove
    the mapping end-to-end; unmatched tensors must be ignored cleanly)."""
    model = {
        "conv1_w": rng.randn(64, 3, 7, 7).astype(np.float32),
        "res_conv1_bn_s": rng.rand(64).astype(np.float32) + 0.5,
        "res_conv1_bn_b": rng.randn(64).astype(np.float32),
        "res_conv1_bn_rm": rng.randn(64).astype(np.float32),
        "res_conv1_bn_riv": rng.rand(64).astype(np.float32) + 0.5,
        "res2_0_branch2a_w": rng.randn(64, 64, 1, 1).astype(np.float32),
        "res2_0_branch2a_bn_s": rng.rand(64).astype(np.float32) + 0.5,
        "res2_0_branch2a_bn_b": rng.randn(64).astype(np.float32),
        "res2_0_branch2a_bn_rm": rng.randn(64).astype(np.float32),
        "res2_0_branch2a_bn_riv": rng.rand(64).astype(np.float32) + 0.5,
        "res2_0_branch1_w": rng.randn(256, 64, 1, 1).astype(np.float32),
        "fc1000_w": rng.randn(1000, 2048).astype(np.float32),  # dropped
    }
    with open(path, "wb") as f:
        pickle.dump({"model": model, "__author__": "test"}, f)
    return model


def test_pretrained_pkl_end_to_end(tmp_path):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "DistillatorRetinaNet"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    for s in (cfg.MODEL.DISTILLATOR.STUDENT.SOLVER,
              cfg.MODEL.DISTILLATOR.TEACHER.SOLVER):
        s.LR_SCHEDULER_NAME = "WarmupMultiStepLR"
        s.STEPS = (10,)
        s.GAMMA = 0.1
        s.WARMUP_FACTOR = 1e-3
        s.WARMUP_ITERS = 2
        s.WARMUP_METHOD = "linear"
    pkl = str(tmp_path / "R-18-fake.pkl")
    rng = np.random.RandomState(0)
    raw = make_fake_r18_pkl(pkl, rng)
    cfg.MODEL.WEIGHTS = pkl
    cfg.SOLVER.MAX_ITER = 10
    cfg.TPU.MAX_INSTANCES = 4
    cfg.freeze()

    model = build_model(cfg, dtype=jnp.float32)
    batch = make_synthetic_batch(batch_size=1, canvas_hw=(64, 64),
                                 max_instances=4)
    init_state, _ = make_train_step(cfg, model)
    state = init_state(jax.random.PRNGKey(0), batch)

    from lgd_tpu.utils.weight_convert import maybe_load_pretrained

    state2 = maybe_load_pretrained(cfg, state)

    bu = state2.params["student"]["bottom_up"]
    fz = state2.frozen["student"]["bottom_up"]
    # stem conv kernel: OIHW -> HWIO
    np.testing.assert_allclose(np.asarray(bu["stem_conv1"]["kernel"]),
                               raw["conv1_w"].transpose(2, 3, 1, 0))
    # stem FrozenBN scale
    np.testing.assert_allclose(np.asarray(fz["stem_conv1_norm"]["scale"]),
                               raw["res_conv1_bn_s"])
    # res2_0 conv1 + its BN mean + shortcut
    np.testing.assert_allclose(
        np.asarray(bu["res2_0"]["conv1"]["kernel"]),
        raw["res2_0_branch2a_w"].transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(fz["res2_0"]["conv1_norm"]["mean"]),
        raw["res2_0_branch2a_bn_rm"])
    np.testing.assert_allclose(
        np.asarray(bu["res2_0"]["shortcut"]["kernel"]),
        raw["res2_0_branch1_w"].transpose(2, 3, 1, 0))
    # untouched tensors keep their init
    np.testing.assert_allclose(
        np.asarray(state2.params["student"]["bottom_up"]["res3_0"]["conv1"]["kernel"]),
        np.asarray(state.params["student"]["bottom_up"]["res3_0"]["conv1"]["kernel"]))


def test_missing_weights_file_is_nonfatal(tmp_path):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "DistillatorRetinaNet"
    cfg.MODEL.WEIGHTS = "detectron2://ImageNetPretrained/MSRA/R-50.pkl"
    cfg.freeze()

    from lgd_tpu.utils.weight_convert import maybe_load_pretrained

    class S:  # minimal stand-in
        params = {}
        frozen = {}

    out = maybe_load_pretrained(cfg, S())
    assert out is S or out is not None  # warns + returns unchanged
