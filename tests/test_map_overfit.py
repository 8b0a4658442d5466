"""End-to-end accuracy signal: train->eval mAP must be nonzero AND improve
with training, through the real do_train/do_test path (checkpoints, resume,
COCO evaluator), overfitting a 4-image single-class synthetic split.

This is the strongest accuracy-parity evidence available without real COCO
data — the reference's integration test is periodic full COCO eval during
training (/root/reference/train.py:217-227). Calibrated on this recipe:
AP50 = 100.0 (AP 70.0) at iter 200; teacher-branch AP50 = 48.1. Gradient
clipping is load-bearing: without it the step after the distill phase flips
on (PRE_NONDISTILL_ITERS) can spike loss_box_reg by ~1e9 and silently wreck
the from-scratch backbone into input-independent predictions (loss still
re-converges to prior-fitting — the trap this test exists to catch).

Heavy (~15 min on the 1-core CPU host): the full LGD RetinaNet-R18 graph
compiles once and runs 200 train iterations + 3 evals.
"""

import jax.numpy as jnp
import numpy as np

from lgd_tpu.config import get_cfg
from lgd_tpu.data import register_synthetic
from lgd_tpu.engine.trainer import do_test, do_train
from lgd_tpu.models.distillator import build_model


def _cfg(out_dir: str, max_iter: int):
    register_synthetic("synthetic_overfit_1c", num_images=4, num_classes=1)
    cfg = get_cfg()
    cfg.merge_from_file("configs/lgd_tpu/retinanet_R18_synthetic_mini.yaml")
    cfg.MODEL.META_ARCHITECTURE = "Distillator" + cfg.MODEL.META_ARCHITECTURE
    cfg.DATASETS.TRAIN = ("synthetic_overfit_1c",)
    cfg.DATASETS.TEST = ("synthetic_overfit_1c",)
    cfg.MODEL.RETINANET.NUM_CLASSES = 1
    cfg.SOLVER.MAX_ITER = max_iter
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.SOLVER.CHECKPOINT_PERIOD = 10000
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "norm"
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    # single-device mesh: 4-way virtual-CPU collectives on the 1-core test
    # host would dominate the runtime (DP parity is covered elsewhere)
    cfg.TPU.TRAIN_DEVICES = 1
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [
        [x, x * 2 ** (1 / 3), x * 2 ** (2 / 3)] for x in [8, 16, 32, 64, 128]]
    for node in (cfg.MODEL.DISTILLATOR.STUDENT.SOLVER,
                 cfg.MODEL.DISTILLATOR.TEACHER.SOLVER):
        node.BASE_LR = 5e-3
        node.STEPS = (100000,)
        node.WARMUP_ITERS = 100
    cfg.MODEL.DISTILLATOR.PRE_NONDISTILL_ITERS = 20
    cfg.MODEL.DISTILLATOR.PRE_FREEZE_STUDENT_BACKBONE_ITERS = 0
    cfg.OUTPUT_DIR = out_dir
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.MODEL.RETINANET.SCORE_THRESH_TEST = 1e-3
    cfg.freeze()
    return cfg


def test_map_overfit_improves_end_to_end(tmp_path):
    out = str(tmp_path / "overfit")

    def train_and_eval(max_iter, resume):
        cfg = _cfg(out, max_iter)
        model = build_model(cfg, dtype=jnp.float32)
        state = do_train(cfg, model, resume=resume)
        variables = {"params": state.params}
        if state.frozen:
            variables["frozen"] = state.frozen
        res = do_test(cfg, model, variables)
        return cfg, model, variables, res["bbox"]

    _, _, _, early = train_and_eval(20, resume=False)
    cfg, model, variables, late = train_and_eval(200, resume=True)

    # mAP is nonzero and improves substantially with training (calibrated:
    # early ~0, late AP50 = 100.0; thresholds leave wide slack for
    # platform noise while still rejecting prior-fitting collapse)
    assert np.isfinite(late["AP50"])
    assert late["AP50"] >= 50.0, late
    assert late["AP50"] >= early["AP50"] + 30.0, (early, late)
    assert late["AP"] >= 25.0, late

    # the teacher branch (teacher features through the student head,
    # EVAL_TEACHER semantics train.py:223-225) must also detect
    tea = do_test(cfg, model, variables, eval_teacher=True)["bbox"]
    assert tea["AP50"] > 0.0, tea
