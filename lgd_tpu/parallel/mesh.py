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
    """Place a host batch pytree with the leading dim sharded over 'data'.

    Single-process: device_put with the named sharding. Multi-process
    (jax.distributed): each host holds only its local slice of the global
    batch (TrainLoader rank/world sharding — the reference's per-rank
    sampler split, utils/build.py:351-352), so assemble the global array
    from process-local data."""
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        def put(x):
            if not (hasattr(x, "shape") and getattr(x, "ndim", 0) > 0):
                return x
            return jax.make_array_from_process_local_data(s, np.asarray(x))

        return jax.tree.map(put, batch)
    return jax.tree.map(
        lambda x: jax.device_put(x, s) if hasattr(x, "shape") and x.ndim > 0
        else x,
        batch,
    )


def allgather_object(obj):
    """Gather an arbitrary picklable object from every process; returns the
    list [obj_rank0, obj_rank1, ...]. The TPU-native stand-in for the
    reference evaluator's comm.gather (detectron2 comm; SURVEY.md §5) used
    to merge per-host detection lists before scoring."""
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    lengths = multihost_utils.process_allgather(
        np.asarray([payload.size], np.int64))
    max_len = int(lengths.max())
    padded = np.zeros(max_len, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(lengths[i, 0])].tobytes())
        for i in range(gathered.shape[0])
    ]
