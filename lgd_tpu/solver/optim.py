"""Solvers: LR schedules and gated dual optimizers.

Equivalents of detectron2 WarmupMultiStepLR / WarmupCosineLR and the
reference's dual-optimizer construction (build_distillator_optimizer /
build_distillator_lr_scheduler, /root/reference/utils/build.py:492-553):
one SGD/AdamW for {student, adapter}, one for {teacher}, each with its own
warmup schedule, optional per-parameter gradient clipping
(SOLVER.CLIP_GRADIENTS, detectron2 maybe_add_gradient_clipping).

The "gate" mechanism replicates the reference's two gradient-freeze
behaviors exactly (train.py:205-207 nulls raw-backbone grads before
PRE_FREEZE_STUDENT_BACKBONE_ITERS; detectron2 FREEZE_AT permanently freezes
stem/early stages): a per-leaf multiplier in {0, 1} is applied to the
*combined* (grad + weight-decay) input, so a gated-off parameter receives an
exactly-zero update and its momentum stays zero — the same net effect as
torch skipping params whose ``.grad is None``.
"""

from __future__ import annotations


from typing import Callable

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# LR schedules (detectron2 semantics)
# ---------------------------------------------------------------------------


def _warmup_factor(method: str, step, warmup_iters: float, warmup_factor: float):
    if warmup_iters <= 0:
        return jnp.asarray(1.0)
    alpha = jnp.clip(step / warmup_iters, 0.0, 1.0)
    if method == "linear":
        f = warmup_factor * (1.0 - alpha) + alpha
    elif method == "constant":
        f = jnp.where(step < warmup_iters, warmup_factor, 1.0)
    else:
        raise ValueError(method)
    return jnp.where(step < warmup_iters, f, 1.0)


def warmup_multistep_lr(base_lr, steps, gamma, warmup_factor, warmup_iters,
                        warmup_method="linear") -> Callable:
    steps = tuple(int(s) for s in steps)

    def schedule(step):
        k = sum(jnp.where(step >= s, 1, 0) for s in steps)
        f = _warmup_factor(warmup_method, step.astype(jnp.float32),
                           float(warmup_iters), float(warmup_factor))
        return base_lr * f * (gamma ** k)

    return schedule


def warmup_cosine_lr(base_lr, max_iter, warmup_factor, warmup_iters,
                     warmup_method="linear") -> Callable:
    def schedule(step):
        f = _warmup_factor(warmup_method, step.astype(jnp.float32),
                           float(warmup_iters), float(warmup_factor))
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * step / max_iter))
        return base_lr * f * cos

    return schedule


def build_lr_schedule(solver_cfg, max_iter: int) -> Callable:
    name = solver_cfg.LR_SCHEDULER_NAME
    if name == "WarmupMultiStepLR":
        return warmup_multistep_lr(
            solver_cfg.BASE_LR, solver_cfg.STEPS, solver_cfg.GAMMA,
            solver_cfg.WARMUP_FACTOR, solver_cfg.WARMUP_ITERS,
            solver_cfg.WARMUP_METHOD,
        )
    if name == "WarmupCosineLR":
        return warmup_cosine_lr(
            solver_cfg.BASE_LR, max_iter, solver_cfg.WARMUP_FACTOR,
            solver_cfg.WARMUP_ITERS, solver_cfg.WARMUP_METHOD,
        )
    raise ValueError(f"Unknown LR scheduler: {name}")


# ---------------------------------------------------------------------------
# Gated optimizers
# ---------------------------------------------------------------------------


class GatedOptimizer:
    """SGD(momentum) / AdamW with per-leaf update gating.

    update(grads, state, params, schedule_step, gates) -> (updates, state)
    where ``gates`` is a pytree of {0., 1.} multipliers (or None).
    """

    def __init__(self, kind: str, schedule: Callable, *, momentum: float = 0.9,
                 weight_decay: float = 1e-4, betas=(0.9, 0.999),
                 eps: float = 1e-8, clip_type: str = "", clip_value: float = 1.0):
        self.kind = kind.upper()
        self.schedule = schedule
        self.momentum = momentum
        self.weight_decay = weight_decay
        self.betas = betas
        self.eps = eps
        self.clip_type = clip_type
        self.clip_value = clip_value
        if self.kind not in ("SGD", "ADAMW"):
            raise NotImplementedError(self.kind)

    def init(self, params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        if self.kind == "SGD":
            return {"momentum": zeros, "count": jnp.zeros((), jnp.int32)}
        return {
            "mu": zeros,
            "nu": jax.tree.map(jnp.zeros_like, params),
            "count": jnp.zeros((), jnp.int32),
        }

    def _clip(self, grads):
        if self.clip_type == "value":
            c = self.clip_value
            return jax.tree.map(lambda g: jnp.clip(g, -c, c), grads)
        if self.clip_type == "norm":
            # detectron2 clips each parameter's grad norm independently
            c = self.clip_value

            def clipnorm(g):
                n = jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2))
                scale = jnp.minimum(1.0, c / jnp.maximum(n, 1e-12))
                return g * scale

            return jax.tree.map(clipnorm, grads)
        return grads

    def update(self, grads, state, params, step, gates=None):
        lr = self.schedule(step)
        grads = self._clip(grads)
        if gates is None:
            gates = jax.tree.map(lambda g: 1.0, grads)

        if self.kind == "SGD":
            wd = self.weight_decay

            def upd(g, p, m, gate):
                eff = (g + wd * p) * gate
                m_new = self.momentum * m + eff
                return -lr * m_new, m_new

            out = jax.tree.map(upd, grads, params, state["momentum"], gates)
            updates = jax.tree.map(lambda t: t[0], out,
                                   is_leaf=lambda t: isinstance(t, tuple))
            new_m = jax.tree.map(lambda t: t[1], out,
                                 is_leaf=lambda t: isinstance(t, tuple))
            return updates, {"momentum": new_m, "count": state["count"] + 1}

        # ADAMW (decoupled weight decay, torch semantics)
        b1, b2 = self.betas
        count = state["count"] + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def upd(g, p, mu, nu, gate):
            g = g * gate
            mu_new = b1 * mu + (1 - b1) * g
            nu_new = b2 * nu + (1 - b2) * (g * g)
            mu_hat = mu_new / c1
            nu_hat = nu_new / c2
            step_dir = mu_hat / (jnp.sqrt(nu_hat) + self.eps)
            return (
                -lr * (step_dir + self.weight_decay * p) * gate,
                mu_new,
                nu_new,
            )

        out = jax.tree.map(upd, grads, params, state["mu"], state["nu"], gates)
        take = lambda i: jax.tree.map(
            lambda t: t[i], out, is_leaf=lambda t: isinstance(t, tuple)
        )
        return take(0), {"mu": take(1), "nu": take(2), "count": count}


def build_solver(solver_cfg, clip_cfg, max_iter: int) -> GatedOptimizer:
    """Build one of the two distillator solvers from a
    MODEL.DISTILLATOR.{STUDENT,TEACHER}.SOLVER node (+ SOLVER.CLIP_GRADIENTS)."""
    schedule = build_lr_schedule(solver_cfg, max_iter)
    clip_type = clip_cfg.CLIP_TYPE if clip_cfg.ENABLED else ""
    return GatedOptimizer(
        solver_cfg.OPTIMIZER,
        schedule,
        momentum=solver_cfg.MOMENTUM,
        weight_decay=float(solver_cfg.WEIGHT_DECAY),
        clip_type=clip_type,
        clip_value=clip_cfg.CLIP_VALUE,
    )
