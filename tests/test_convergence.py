"""Overfit-one-batch: the full dual-optimizer LGD train step must actually
learn (total loss drops substantially when repeating a single batch) — the
'training works' signal available without COCO data. Complements the
parity goldens, which only check single-step numerics."""

import jax
import jax.numpy as jnp
import numpy as np

from lgd_tpu.config import get_cfg
from lgd_tpu.data import make_synthetic_batch
from lgd_tpu.engine import make_train_step
from lgd_tpu.models.distillator import build_model


def test_overfit_single_batch_loss_drops():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "DistillatorRetinaNet"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.TPU.MAX_INSTANCES = 4
    cfg.TPU.ATTENTION_IMPL = "reference"
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.DISTILLATOR.PRE_NONDISTILL_ITERS = 0
    cfg.MODEL.DISTILLATOR.PRE_FREEZE_STUDENT_BACKBONE_ITERS = 0
    cfg.SOLVER.MAX_ITER = 1000
    for s in (cfg.MODEL.DISTILLATOR.STUDENT.SOLVER,
              cfg.MODEL.DISTILLATOR.TEACHER.SOLVER):
        s.LR_SCHEDULER_NAME = "WarmupMultiStepLR"
        # from-scratch on a 2-image batch: keep it cool (the reference's
        # 0.01 assumes batch 16 + pretrained backbone + 1000-iter warmup)
        s.BASE_LR = 0.002
        s.STEPS = (900,)
        s.GAMMA = 0.1
        s.WARMUP_FACTOR = 0.1
        s.WARMUP_ITERS = 10
        s.WARMUP_METHOD = "linear"
    cfg.freeze()

    model = build_model(cfg, dtype=jnp.float32)
    batch = make_synthetic_batch(batch_size=2, canvas_hw=(64, 64),
                                 max_instances=4, seed=3)
    init_state, train_step = make_train_step(cfg, model)
    state = init_state(jax.random.PRNGKey(0), batch)
    jstep = jax.jit(train_step, donate_argnums=(0,))

    totals = []
    for _ in range(60):
        state, metrics = jstep(state, batch)
        totals.append(float(metrics["total_loss"]))
    first = np.mean(totals[:5])
    last = np.mean(totals[-5:])
    assert np.isfinite(totals).all(), totals
    assert last < 0.8 * first, (first, last, totals[::10])
