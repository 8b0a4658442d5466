"""Checkpoint / resume via Orbax.

Equivalent of detectron2 DetectionCheckpointer + PeriodicCheckpointer with
the reference's extra checkpointables (dual optimizer/scheduler states and
the iteration counter; train.py:155-167,234): the whole TrainState pytree
{params(student, teacher, adapter), frozen BN stats, both opt states, step,
loss_normalizer} is saved as one atomic Orbax checkpoint. Cold-start weight
import from detectron2 ImageNet pkls is handled by
lgd_tpu.utils.weight_convert (separate, host-side).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


class Checkpointer:
    def __init__(self, output_dir: str, max_to_keep: int = 10):
        self.dir = os.path.abspath(os.path.join(output_dir, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state):
        self.mngr.save(step, args=ocp.args.StandardSave(state))
        logger.info("Saved checkpoint at iteration %d -> %s", step, self.dir)

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def resume_or_load(self, state, resume: bool = True):
        """Restore the latest checkpoint into the given state template.
        Returns (state, start_iter)."""
        step = self.latest_step()
        if not resume or step is None:
            return state, 0
        restored = self.mngr.restore(
            step, args=ocp.args.StandardRestore(state)
        )
        logger.info("Resumed from checkpoint at iteration %d", step)
        return restored, int(step) + 1

    def wait(self):
        self.mngr.wait_until_finished()


class PeriodicCheckpointer:
    """Save every ``period`` iterations and at max_iter (train.py:165-167)."""

    def __init__(self, checkpointer: Checkpointer, period: int, max_iter: int):
        self.ckpt = checkpointer
        self.period = period
        self.max_iter = max_iter

    def step(self, iteration: int, state):
        if (iteration + 1) % self.period == 0 or iteration == self.max_iter - 1:
            self.ckpt.save(iteration, jax.device_get(state))
