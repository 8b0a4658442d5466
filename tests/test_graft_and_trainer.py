"""Driver-facing entry points + end-to-end trainer loop on the synthetic
mini split (the closest thing to the reference's 'run train.py' integration
check, SURVEY.md §4)."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8dev():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_trainer_end_to_end(tmp_path):
    """do_train for a few iterations + do_test (incl. teacher branch) via
    the real TrainLoader on the synthetic mini split."""
    import jax.numpy as jnp

    from lgd_tpu.config import get_cfg
    from lgd_tpu.engine.trainer import do_test, do_train
    from lgd_tpu.models.distillator import build_model

    cfg = get_cfg()
    cfg.merge_from_file("configs/lgd_tpu/retinanet_R18_synthetic_mini.yaml")
    cfg.MODEL.META_ARCHITECTURE = "Distillator" + cfg.MODEL.META_ARCHITECTURE
    cfg.SOLVER.MAX_ITER = 4
    cfg.SOLVER.CHECKPOINT_PERIOD = 2
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.INPUT.MIN_SIZE_TRAIN = (128,)
    cfg.INPUT.MAX_SIZE_TRAIN = 192
    cfg.INPUT.MIN_SIZE_TEST = 128
    cfg.INPUT.MAX_SIZE_TEST = 192
    cfg.freeze()

    model = build_model(cfg, dtype=jnp.float32)
    state = do_train(cfg, model, resume=False)
    assert int(state.step) == 4
    # checkpoints written
    ckpts = os.listdir(os.path.join(str(tmp_path), "checkpoints"))
    assert len(ckpts) >= 1

    variables = {"params": state.params}
    if state.frozen:
        variables["frozen"] = state.frozen
    res = do_test(cfg, model, variables)
    assert "bbox" in res and "AP" in res["bbox"]
    res_tea = do_test(cfg, model, variables, eval_teacher=True)
    assert "bbox" in res_tea

    # resume restores the step counter
    state2 = do_train(cfg, model, resume=True)
    assert int(state2.step) == 4  # already at max_iter; nothing to do
