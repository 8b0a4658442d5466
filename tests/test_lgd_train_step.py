"""End-to-end LGD distillation train-step tests on the synthetic mini split,
including multi-device data parallelism on the virtual 8-CPU mesh
(SURVEY.md §4 implied test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgd_tpu.config import get_cfg
from lgd_tpu.data import make_synthetic_batch
from lgd_tpu.engine import jit_train_step, make_train_step
from lgd_tpu.models.distillator import build_model
from lgd_tpu.parallel import make_mesh, shard_batch


def small_cfg(**overrides):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "DistillatorRetinaNet"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [
        [x, x * 2 ** (1 / 3), x * 2 ** (2 / 3)] for x in [32, 64, 128, 256, 512]
    ]
    cfg.MODEL.RETINANET.SMOOTH_L1_LOSS_BETA = 0.0
    cfg.MODEL.DISTILLATOR.TEACHER.ADD_CONTEXT_BOX = True
    cfg.MODEL.DISTILLATOR.STUDENT.SOLVER.LR_SCHEDULER_NAME = "WarmupMultiStepLR"
    cfg.MODEL.DISTILLATOR.STUDENT.SOLVER.BASE_LR = 0.01
    cfg.MODEL.DISTILLATOR.STUDENT.SOLVER.STEPS = (100, 200)
    cfg.MODEL.DISTILLATOR.STUDENT.SOLVER.GAMMA = 0.1
    cfg.MODEL.DISTILLATOR.STUDENT.SOLVER.WARMUP_FACTOR = 1e-3
    cfg.MODEL.DISTILLATOR.STUDENT.SOLVER.WARMUP_ITERS = 10
    cfg.MODEL.DISTILLATOR.STUDENT.SOLVER.WARMUP_METHOD = "linear"
    for k, v in cfg.MODEL.DISTILLATOR.STUDENT.SOLVER.items():
        if k != "AMP":
            cfg.MODEL.DISTILLATOR.TEACHER.SOLVER[k] = v
    cfg.MODEL.DISTILLATOR.PRE_NONDISTILL_ITERS = 2
    cfg.MODEL.DISTILLATOR.POST_NONDISTILL_ITERS = 0
    cfg.MODEL.DISTILLATOR.PRE_FREEZE_STUDENT_BACKBONE_ITERS = 1
    cfg.SOLVER.MAX_ITER = 300
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.TPU.MAX_INSTANCES = 8
    for k, v in overrides.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    cfg.freeze()
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    model = build_model(cfg, dtype=jnp.float32)
    batch = make_synthetic_batch(batch_size=2, canvas_hw=(128, 128),
                                 max_instances=8, seed=0)
    init_state, train_step = make_train_step(cfg, model)
    state = init_state(jax.random.PRNGKey(0), batch)
    return cfg, model, batch, train_step, state


def test_param_tree_structure(setup):
    _, _, _, _, state = setup
    assert set(state.params.keys()) == {"student", "teacher", "adapter"}
    assert "bottom_up" in state.params["student"]
    assert "label_encoder_" in state.params["teacher"]


def test_losses_finite_and_complete(setup):
    cfg, model, batch, train_step, state = setup
    new_state, metrics = jax.jit(train_step)(state, batch)
    expected = {
        "loss_cls", "loss_box_reg", "loss_cls.tea", "loss_box_reg.tea",
        "loss_distill", "total_loss", "stu_lr", "tea_lr", "distill_flag",
    }
    assert expected <= set(metrics.keys())
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), (k, v)
    assert int(new_state.step) == 1
    # normalizer updated twice (student + teacher passes), EMA moved
    assert float(new_state.loss_normalizer) != 100.0


def test_phase_gating(setup):
    cfg, model, batch, train_step, state = setup
    jstep = jax.jit(train_step)
    # step 0: distill off (PRE_NONDISTILL_ITERS=2), backbone frozen
    s1, m0 = jstep(state, batch)
    assert float(m0["distill_flag"]) == 0.0
    bb0 = state.params["student"]["bottom_up"]
    bb1 = s1.params["student"]["bottom_up"]
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), bb0, bb1)
    assert max(jax.tree.leaves(diffs)) == 0.0, "backbone must be frozen at step 0"
    # head must move
    h0 = jax.tree.leaves(state.params["student"]["head"])
    h1 = jax.tree.leaves(s1.params["student"]["head"])
    assert any(float(jnp.max(jnp.abs(a - b))) > 0 for a, b in zip(h0, h1))
    # teacher must move (its loss flows through student head)
    t0 = jax.tree.leaves(state.params["teacher"])
    t1 = jax.tree.leaves(s1.params["teacher"])
    assert any(float(jnp.max(jnp.abs(a - b))) > 0 for a, b in zip(t0, t1))

    # advance to step 2: distill on, backbone unfrozen
    s2, m1 = jstep(s1, batch)
    assert float(m1["distill_flag"]) == 0.0  # step 1 < 2
    s3, m2 = jstep(s2, batch)
    assert float(m2["distill_flag"]) == 1.0  # step 2 >= 2
    bb2 = s2.params["student"]["bottom_up"]
    bb3 = s3.params["student"]["bottom_up"]
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), bb2, bb3)
    # res3..res5 move; stem/res2 stay frozen via FREEZE_AT=2
    moved = {k: v for k, v in diffs.items()}
    assert max(jax.tree.leaves({k: v for k, v in moved.items()
                                if k.startswith("res3")})) > 0
    assert max(jax.tree.leaves({k: v for k, v in moved.items()
                                if k.startswith("stem") or k.startswith("res2_")}),
               default=0.0) == 0.0


def test_empty_gt_image_trains(setup):
    cfg, model, batch, train_step, state = setup
    # blank out image 1's GT: the empty-GT fallback path must stay finite
    gt = batch["gt"]
    import dataclasses

    gt2 = dataclasses.replace(
        gt, valid=gt.valid.at[1].set(False))
    batch2 = dict(batch, gt=gt2)
    _, metrics = jax.jit(train_step)(state, batch2)
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), (k, v)


def test_data_parallel_8dev_matches_single(setup):
    """DP over the virtual 8-device mesh must match single-device numerics
    (the reference's DDP + all-reduced normalizers, SURVEY.md §2.4)."""
    cfg, model, _, train_step, _ = setup
    batch = make_synthetic_batch(batch_size=8, canvas_hw=(128, 128),
                                 max_instances=8, seed=3)
    init_state, train_step = make_train_step(cfg, model)
    state = init_state(jax.random.PRNGKey(0), batch)

    _, m_single = jax.jit(train_step)(state, batch)

    mesh = make_mesh(("data",))
    sharded = shard_batch(batch, mesh)
    jstep = jit_train_step(train_step, mesh, batch)
    _, m_dp = jstep(state, sharded)

    for k in ("total_loss", "loss_cls", "loss_distill"):
        np.testing.assert_allclose(
            float(m_single[k]), float(m_dp[k]), rtol=2e-4,
            err_msg=f"DP mismatch on {k}",
        )
