"""Worker for the multi-process EVAL compile-barrier test (ADVICE r3 #3):
2 processes x 2 CPU devices drive the per-canvas-shape AOT eval path
(engine/trainer._get_infer) across two canvas shapes x {student, teacher}
branches — 4 compile events, each followed by a coordination-service
barrier. Ranks must stay in lockstep through the whole sequence (a
desynchronized barrier name would deadlock until the 30 min timeout)."""

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
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_mp_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax

    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nprocs,
                               process_id=rank)
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _cfg
    from lgd_tpu.data import make_synthetic_batch
    from lgd_tpu.engine.trainer import _get_infer
    from lgd_tpu.models.distillator import build_model
    from lgd_tpu.parallel import make_mesh, shard_batch

    cfg = _cfg(depth=18, max_inst=4, tiny=True, attn_impl="reference")
    model = build_model(cfg, dtype=jnp.float32)

    gbatch = make_synthetic_batch(batch_size=2 * nprocs, canvas_hw=(64, 96),
                                  max_instances=4, seed=0)
    variables = model.init(
        jax.random.PRNGKey(0), gbatch["image"], gbatch["image_size"],
        gbatch["gt"], False, method=model.inference)

    mesh = make_mesh(("data",), devices=jax.devices())
    infer = _get_infer(model, mesh)

    sums = {}
    # the lockstep sequence: landscape/portrait x student/teacher — the
    # exact per-shape compile-miss order do_test produces (TestLoader
    # bucketing is rank-invariant; EVAL_TEACHER re-runs every shape)
    for hw in ((64, 96), (96, 64)):
        b = make_synthetic_batch(batch_size=2 * nprocs, canvas_hw=hw,
                                 max_instances=4, seed=1)
        local = jax.tree.map(
            lambda x: x[rank * 2:(rank + 1) * 2]
            if getattr(x, "ndim", 0) > 0 else x,
            {k: b[k] for k in ("image", "image_size", "gt")})
        dev = shard_batch(local, mesh)
        for eval_teacher in (False, True):
            out = infer(variables, dev["image"], dev["image_size"],
                        dev["gt"], eval_teacher)
            out = jax.device_get(out)
            dets = out[0] if isinstance(out, tuple) else out
            sums[f"{hw[0]}x{hw[1]}_tea{int(eval_teacher)}"] = float(
                np.sum(np.asarray(dets.scores)))
            print(f"[{rank}] infer {hw} teacher={eval_teacher} done",
                  flush=True)

    with open(out_path, "w") as f:
        json.dump(sums, f)
    print(f"[{rank}] MP_EVAL_WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
