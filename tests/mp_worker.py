"""Worker for the multi-process DP integration test (launched as a
subprocess by test_multiprocess_dp.py): one LGD train step over a mesh
spanning 2 processes x 2 CPU devices, batch assembled from process-local
slices (the reference's per-rank DDP split, train.py:277-310)."""

import json
import os
import sys


def main():
    rank = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=2 "
        "--xla_backend_optimization_level=0 "
        "--xla_cpu_collective_call_terminate_timeout_seconds=600")
    # both ranks compile the identical program on one shared core; the
    # persistent cache lets rank 1 (and every rerun) reuse rank 0's compile
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_mp_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax

    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nprocs,
                               process_id=rank)
    assert jax.process_index() == rank
    assert jax.device_count() == 2 * nprocs

    import jax.numpy as jnp

    from __graft_entry__ import _cfg
    from lgd_tpu.data import make_synthetic_batch
    from lgd_tpu.engine import jit_train_step, make_train_step
    from lgd_tpu.models.distillator import build_model
    from lgd_tpu.parallel import make_mesh, shard_batch
    from lgd_tpu.parallel.mesh import allgather_object

    cfg = _cfg(depth=18, max_inst=4, tiny=True, attn_impl="reference")
    model = build_model(cfg, dtype=jnp.float32)

    # identical global batch everywhere; this process owns rows
    # [rank*2, rank*2+2) — exactly what TrainLoader(rank, world) yields
    gbatch = make_synthetic_batch(batch_size=2 * nprocs,
                                  canvas_hw=(64, 64), max_instances=4,
                                  seed=0)
    local = jax.tree.map(
        lambda x: x[rank * 2:(rank + 1) * 2]
        if getattr(x, "ndim", 0) > 0 else x, gbatch)

    init_state, train_step = make_train_step(cfg, model)
    state = init_state(jax.random.PRNGKey(0), gbatch)

    mesh = make_mesh(("data",), devices=jax.devices())
    sharded = shard_batch(local, mesh)  # global assembly across processes
    jstep = jit_train_step(train_step, mesh, gbatch)

    # AOT-compile BEFORE any collective executes. Compile-time skew across
    # ranks (e.g. one rank hitting the persistent compile cache while the
    # other compiles for minutes on this shared core) otherwise trips
    # Gloo's hard 30 s context-init timeout at the first collective: the
    # fast rank sits in the Gloo rendezvous while the slow rank is still in
    # XLA. Compilation is process-local, so ranks may finish it arbitrarily
    # far apart; the coordination-service barrier (plain TCP to the rank-0
    # coordinator, no Gloo) then releases both ranks into the first
    # collective within milliseconds of each other.
    compiled = jstep.lower(state, sharded).compile()
    print(f"[{rank}] compiled; waiting at barrier", flush=True)
    from lgd_tpu.parallel.barrier import wait_at_barrier

    wait_at_barrier("lgd_mp_compile_done")

    new_state, metrics = compiled(state, sharded)
    jax.block_until_ready(metrics)
    out = {k: float(v) for k, v in metrics.items()}

    ranks = allgather_object({"rank": rank})
    assert [r["rank"] for r in ranks] == list(range(nprocs)), ranks

    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"[{rank}] MP_WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
