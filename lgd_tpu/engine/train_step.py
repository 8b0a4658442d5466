"""TrainState + the single jitted LGD train step.

TPU-native equivalent of the reference's plain training loop body
(do_train, /root/reference/train.py:148-234): one compiled program
``(state, batch) -> (state, metrics)`` containing the full student forward,
dynamic-teacher forward, distill loss, backward, dual optimizer updates and
both LR schedules. Phase scheduling (train.py:184-189 distill on/off;
train.py:205-207 backbone grad freeze) is driven by *traced* comparisons on
``state.step`` so every phase runs the same executable — no recompiles, no
python in the hot loop. Under a data mesh the batch is sharded on its
leading axis; XLA inserts the gradient all-reduces (replacing DDP/NCCL).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..parallel.mesh import batch_sharding, replicated
from ..solver.optim import build_solver



@struct.dataclass
class TrainState:
    params: Any
    frozen: Any                 # FrozenBN statistics (never updated)
    stu_opt: Any
    tea_opt: Any
    step: jax.Array             # int32 scalar
    loss_normalizer: jax.Array  # RetinaNet EMA normalizer (float32 scalar)


def freeze_gates(params_student, freeze_at: int):
    """Static 0/1 gates replicating detectron2 BACKBONE.FREEZE_AT: 1 freezes
    the stem, 2 also freezes res2, etc. Applied only to the bottom-up."""

    def gate_for(path) -> float:
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if not names or names[0] != "bottom_up":
            return 1.0
        for n in names[1:]:
            if n.startswith("stem") and freeze_at >= 1:
                return 0.0
            # detectron2: FREEZE_AT=k freezes stem and res2..res{k}
            if n.startswith("res") and n[3].isdigit() and freeze_at >= int(n[3]):
                return 0.0
        return 1.0

    return jax.tree_util.tree_map_with_path(
        lambda path, _: gate_for(path), params_student
    )


def make_train_step(cfg, model) -> Tuple[Callable, Callable]:
    """Returns (init_state, train_step); train_step is jit-ready."""
    dist = cfg.MODEL.DISTILLATOR
    pre_nd = int(dist.PRE_NONDISTILL_ITERS)
    post_nd = int(dist.POST_NONDISTILL_ITERS)
    pre_freeze = int(dist.PRE_FREEZE_STUDENT_BACKBONE_ITERS)
    max_iter = int(cfg.SOLVER.MAX_ITER)
    freeze_at = int(cfg.MODEL.BACKBONE.FREEZE_AT)

    stu_solver = build_solver(dist.STUDENT.SOLVER, cfg.SOLVER.CLIP_GRADIENTS,
                              max_iter)
    tea_solver = build_solver(dist.TEACHER.SOLVER, cfg.SOLVER.CLIP_GRADIENTS,
                              max_iter)

    def init_state(rng, batch) -> TrainState:
        k1, k2 = jax.random.split(rng)
        variables = model.init(
            {"params": k1, "sampling": k2, "dropout": k2},
            batch["image"], batch["image_size"], batch["gt"],
            jnp.float32(0.0), jnp.float32(100.0),
            method=model.train_forward,
        )
        params = variables["params"]
        frozen = variables.get("frozen", {})
        stu_params = {"student": params["student"],
                      "adapter": params["adapter"]}
        tea_params = {"teacher": params["teacher"]}
        return TrainState(
            params=params,
            frozen=frozen,
            stu_opt=stu_solver.init(stu_params),
            tea_opt=tea_solver.init(tea_params),
            step=jnp.zeros((), jnp.int32),
            loss_normalizer=jnp.asarray(100.0, jnp.float32),
        )


    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        step = state.step
        distill_flag = (
            (step >= pre_nd) & (step <= max_iter - post_nd)
        ).astype(jnp.float32)
        backbone_gate = (step >= pre_freeze).astype(jnp.float32)

        # per-step rng streams (RPN/ROI subsampling, drop-path)
        step_rng = jax.random.fold_in(jax.random.PRNGKey(17), step)
        r_sample, r_drop = jax.random.split(step_rng)

        def loss_fn(params):
            variables = {"params": params}
            if state.frozen:
                variables["frozen"] = state.frozen
            losses, new_norm = model.apply(
                variables, batch["image"], batch["image_size"], batch["gt"],
                distill_flag, state.loss_normalizer,
                method=model.train_forward,
                rngs={"sampling": r_sample, "dropout": r_drop},
            )
            total = sum(jax.tree.leaves(losses))
            return total, (losses, new_norm)

        (total, (losses, new_norm)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        # permanent FREEZE_AT gates x dynamic pre-freeze gate on the
        # student bottom-up (train.py:205-207)
        sgates = freeze_gates(state.params["student"], freeze_at)
        sgates = jax.tree_util.tree_map_with_path(
            lambda path, g: g * backbone_gate
            if getattr(path[0], "key", None) == "bottom_up"
            else g,
            sgates,
        )
        stu_gates = {"student": sgates,
                     "adapter": jax.tree.map(lambda _: 1.0,
                                             state.params["adapter"])}

        stu_params = {"student": state.params["student"],
                      "adapter": state.params["adapter"]}
        tea_params = {"teacher": state.params["teacher"]}
        stu_grads = {"student": grads["student"], "adapter": grads["adapter"]}
        tea_grads = {"teacher": grads["teacher"]}

        stu_updates, stu_opt = stu_solver.update(
            stu_grads, state.stu_opt, stu_params, step, stu_gates)
        tea_updates, tea_opt = tea_solver.update(
            tea_grads, state.tea_opt, tea_params, step)

        new_params = dict(state.params)
        new_params["student"] = jax.tree.map(
            jnp.add, state.params["student"], stu_updates["student"])
        new_params["adapter"] = jax.tree.map(
            jnp.add, state.params["adapter"], stu_updates["adapter"])
        new_params["teacher"] = jax.tree.map(
            jnp.add, state.params["teacher"], tea_updates["teacher"])

        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["stu_lr"] = stu_solver.schedule(step)
        metrics["tea_lr"] = tea_solver.schedule(step)
        metrics["distill_flag"] = distill_flag

        new_state = TrainState(
            params=new_params,
            frozen=state.frozen,
            stu_opt=stu_opt,
            tea_opt=tea_opt,
            step=step + 1,
            loss_normalizer=new_norm,
        )
        return new_state, metrics

    return init_state, train_step


def jit_train_step(train_step, mesh, example_batch):
    """jit with batch sharded over 'data', state replicated: the XLA-SPMD
    equivalent of DDP (grad all-reduce inserted by the partitioner)."""
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    batch_sh = jax.tree.map(
        lambda x: bs if getattr(x, "ndim", 0) > 0 else rep, example_batch
    )
    return jax.jit(train_step, in_shardings=(rep, batch_sh),
                   out_shardings=(rep, rep))
