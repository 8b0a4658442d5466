"""Capture + summarize a device profile of one bench row's train step.

Usage (default env — needs the real TPU chip; ONE TPU process at a time):
    python tools/profile_row.py lgd_faster_rcnn_r50 [--steps 5] [--out DIR]

Runs the named `bench.py` row's jitted train step under
``jax.profiler.trace(..., create_perfetto_trace=True)`` and parses the
perfetto JSON into per-op-class device-time buckets (the methodology behind
PROFILES.md). The reference has no profiling subsystem at all (SURVEY.md
§5); this is the committed form of the ad-hoc scripts used in rounds 3-4.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bucket(name: str) -> str:
    n = name.split(".")[0].split("(")[0]
    for key in ("copy", "reshape", "transpose", "while", "sort", "convert",
                "broadcast", "reduce", "select", "iota", "concatenate",
                "dynamic-slice", "dynamic-update-slice", "scatter", "gather",
                "pad", "slice", "custom-call", "all-reduce", "all-gather"):
        if n.startswith(key):
            return key
    if n.startswith(("conv", "dot", "cublas", "fusion")):
        # XLA:TPU emits convs/dots inside fusions; keep 'fusion' separate
        return "fusion" if n.startswith("fusion") else "conv/dot"
    return "other"


def summarize_perfetto(path: str, n_steps: int):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    # device threads: pid whose process_name metadata contains 'TPU'/'device'
    proc_names = {}
    thread_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    device_pids = {p for p, n in proc_names.items()
                   if "TPU" in n or "device" in n.lower() or "/device" in n}
    buckets = collections.Counter()
    per_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = thread_names.get((e["pid"], e.get("tid")), "")
        # XLA op rows live on "XLA Ops"-style threads; skip step/framework
        # annotation rows which double-count the same wall time
        if "step" in tname.lower() or "framework" in tname.lower():
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        name = e.get("name", "?")
        # module-level annotation rows (jit_<fn>(fingerprint)) span the whole
        # step on their own thread and would double-count every op under them
        if "(" in name and name.startswith(("jit_", "pjit_")):
            continue
        buckets[_bucket(name)] += dur
        per_op[name] += dur
        total += dur

    ms = 1e3 * n_steps  # us -> ms, per step
    print(f"\ndevice op total: {total / ms:.1f} ms/step "
          f"(over {n_steps} steps)")
    print("\n-- buckets (ms/step) --")
    for k, v in buckets.most_common():
        print(f"{k:24s} {v / ms:9.2f}  ({v / max(total, 1e-9):.1%})")
    print("\n-- top 25 ops (ms/step) --")
    for k, v in per_op.most_common(25):
        print(f"{v / ms:9.3f}  {k[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("row")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/lgd_profile")
    ap.add_argument("--batch", type=int, default=0,
                    help="override the row's first-ladder batch size")
    ap.add_argument("--parse-only", default="",
                    help="skip capture; parse this trace file")
    args = ap.parse_args()

    if args.parse_only:
        summarize_perfetto(args.parse_only, args.steps)
        return

    import jax

    from bench import ROWS, CANVAS, _ref_cfg
    from lgd_tpu.data import make_synthetic_batch
    from lgd_tpu.engine import make_train_step
    from lgd_tpu.models.distillator import build_model
    import jax.numpy as jnp

    spec = ROWS[args.row]
    pattern, extra, ladder = spec[:3]
    canvas = spec[3] if len(spec) > 3 else CANVAS
    batch_size = args.batch or ladder[0]
    cfg = _ref_cfg(pattern, extra)

    model = build_model(cfg, dtype=jnp.bfloat16)
    wm = bool(cfg.MODEL.MASK_ON)
    batch = make_synthetic_batch(batch_size=batch_size,
                                 canvas_hw=(canvas, canvas),
                                 max_instances=32, seed=0, with_masks=wm)
    init_state, train_step = make_train_step(cfg, model)
    tiny = make_synthetic_batch(batch_size=1, canvas_hw=(128, 128),
                                max_instances=32, seed=0, with_masks=wm)
    state = jax.jit(init_state)(jax.random.PRNGKey(0), tiny)
    jstep = jax.jit(train_step)
    t0 = time.time()
    state, m = jstep(state, batch)
    jax.block_until_ready(m)
    print(f"compile+first step: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    for _ in range(3):
        state, m = jstep(state, batch)
    jax.block_until_ready(m)
    step_ms = (time.time() - t0) / 3 * 1000
    print(f"steady step: {step_ms:.1f} ms ({batch_size / step_ms * 1000:.2f}"
          " img/s)", flush=True)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out, create_perfetto_trace=True):
        for _ in range(args.steps):
            state, m = jstep(state, batch)
        jax.block_until_ready(m)

    traces = sorted(glob.glob(os.path.join(
        args.out, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not traces:
        print(f"no perfetto trace found under {args.out}", file=sys.stderr)
        sys.exit(1)
    print(f"trace: {traces[-1]}")
    summarize_perfetto(traces[-1], args.steps)


if __name__ == "__main__":
    main()
