"""Device mesh + sharding helpers.

TPU-native replacement for the reference's distributed runtime (detectron2
``launch`` + DistributedDataParallel + NCCL, train.py:277-310; SURVEY.md
§2.4): a single SPMD program over a ``jax.sharding.Mesh``. Data parallelism
= batch sharded over the 'data' axis; parameters replicated; gradient
all-reduce and the global loss-normalizer reductions are inserted by XLA and
ride ICI. Multi-host scaling uses the same mesh spanning
``jax.distributed.initialize``'d processes.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Sequence[str] = ("data",), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if len(axes) == 1:
        shape = (n,)
    else:
        raise NotImplementedError(
            "LGD models are DP-only (reference has no TP/PP); extend here "
            "when sharded-parameter variants are added"
        )
    return Mesh(np.asarray(devices).reshape(shape), axis_names=tuple(axes))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree with the leading dim sharded over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, s) if hasattr(x, "shape") and x.ndim > 0
        else x,
        batch,
    )
