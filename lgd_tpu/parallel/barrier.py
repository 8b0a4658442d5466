"""Cross-process compile barrier.

Compilation is process-local, so ranks can finish a compile arbitrarily far
apart (e.g. one rank hits the persistent compile cache while another
compiles for minutes). If the fast rank then enters the first collective
alone, Gloo's hard 30 s context-init timeout kills the run. The
coordination-service barrier (plain TCP to the rank-0 coordinator, no Gloo)
releases all ranks into the first collective within milliseconds of each
other. Used by engine/trainer.py (eval AOT compiles) and tests/mp_worker.py
(train-step compile).

The preferred implementation is the distributed-runtime client's
``wait_at_barrier`` — reached through the private ``jax._src.distributed``
module (verified against jax 0.9.x; there is no public binding yet). If a
jax upgrade moves it, we fall back to
``multihost_utils.sync_global_devices``, which compiles a trivial psum —
small enough that cross-rank skew stays far below the Gloo timeout.
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger(__name__)


def wait_at_barrier(name: str, timeout_ms: int = 1_800_000) -> None:
    """Block until every process has reached the barrier ``name``.

    No-op in single-process runs. ``name`` must be identical on every rank
    and never reused for a *different* synchronization point.
    """
    if jax.process_count() == 1:
        return
    try:
        from jax._src import distributed  # noqa: PLC0415 - guarded private API

        client = distributed.global_state.client
    except (ImportError, AttributeError):
        client = None
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)
        return
    logger.warning(
        "jax._src.distributed barrier unavailable (jax upgrade?); falling "
        "back to sync_global_devices(%s)", name)
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


# per-tag counters so repeated barriers at the same code site get unique,
# rank-invariant names. Counts stay in lockstep across ranks as long as the
# per-tag hit sequence is rank-invariant (e.g. eval bucketing is
# deterministic in the dataset order, not in any process-local state).
_COUNTS: dict = {}


def unique_barrier_name(tag: str) -> str:
    n = _COUNTS.get(tag, 0)
    _COUNTS[tag] = n + 1
    return f"{tag}_{n}"
