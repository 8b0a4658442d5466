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


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        name = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, name))
        else:
            out[name] = v
    return out


def save_variables_npz(path: str, params, frozen=None):
    """Serialize a full variables tree to one .npz (the 'converted weights
    file' format for --eval-only without a prior training run; our
    torch-checkpoint converters emit this)."""
    import numpy as np

    flat = {f"params/{k}": np.asarray(v)
            for k, v in _flatten(jax.device_get(params)).items()}
    if frozen:
        flat.update({f"frozen/{k}": np.asarray(v)
                     for k, v in _flatten(jax.device_get(frozen)).items()})
    np.savez(path, **flat)


def load_weights(path: str, state):
    """cfg.MODEL.WEIGHTS resolution for --eval-only (the reference
    evaluates the weights file directly, /root/reference/train.py:267-270):

    - an OUTPUT_DIR (or its checkpoints/ subdir) from a previous run ->
      restore the latest full TrainState checkpoint;
    - a .npz full-variables dump (save_variables_npz) -> merge into params
      + frozen;
    - anything else -> the converted-torch backbone importer
      (utils/weight_convert.maybe_load_pretrained handles pkl/pth).
    """
    import numpy as np

    if os.path.isdir(path):
        root = path
        if os.path.basename(os.path.normpath(path)) == "checkpoints":
            root = os.path.dirname(os.path.normpath(path))
        ckpt = Checkpointer(root)
        if ckpt.latest_step() is None:
            raise FileNotFoundError(
                f"MODEL.WEIGHTS={path}: no checkpoint found")
        state, _ = ckpt.resume_or_load(state, resume=True)
        return state
    if path.endswith(".npz"):
        raw = np.load(path)
        params = jax.device_get(state.params)
        frozen = jax.device_get(state.frozen)
        # The .npz format is a FULL variables dump (save_variables_npz):
        # verify exact key coverage so a stale/mismatched file cannot
        # silently leave tensors at random init (the reference's
        # DetectionCheckpointer logs missing/unexpected keys; here a
        # partial dump means --eval-only would report garbage mAP, so
        # raise instead).
        expected = set(f"params/{k}" for k in _flatten(params))
        expected |= set(f"frozen/{k}" for k in _flatten(frozen or {}))
        got = set(raw.files)
        missing, unexpected = sorted(expected - got), sorted(got - expected)
        if missing or unexpected:
            raise ValueError(
                f"{path} does not cover the model's variables: "
                f"{len(missing)} missing (e.g. {missing[:5]}), "
                f"{len(unexpected)} unexpected (e.g. {unexpected[:5]}). "
                "A .npz MODEL.WEIGHTS file must be a full dump from "
                "save_variables_npz for this config.")
        for key in raw.files:
            coll, *parts = key.split("/")
            node = {"params": params, "frozen": frozen}[coll]
            for p in parts[:-1]:
                node = node[p]
            leaf = parts[-1]
            if tuple(node[leaf].shape) != tuple(raw[key].shape):
                raise ValueError(
                    f"{path}: shape mismatch for {key}: checkpoint "
                    f"{tuple(raw[key].shape)} vs model "
                    f"{tuple(node[leaf].shape)}")
            node[leaf] = raw[key].astype(np.asarray(node[leaf]).dtype)
        logger.info("Loaded %d tensors from %s", len(raw.files), path)
        import jax.numpy as jnp

        return state.replace(
            params=jax.tree.map(jnp.asarray, params),
            frozen=jax.tree.map(jnp.asarray, frozen))
    raise FileNotFoundError(path)
