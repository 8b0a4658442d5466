"""HLO canary: make flagship perf regressions visible without a TPU.

Lowers the flagship (DistillatorRetinaNet R-50) train step on CPU and
records structural metrics of the StableHLO: op-class counts (while loops,
sorts, scatters, gathers, convolutions, dot_generals) and the largest
intermediate tensor in bytes. The checked-in baseline (tools/hlo_canary.json)
is compared exactly by tests/test_hlo_canary.py — re-introducing the
r3-573dc39 regression class (vmap GT assignment: the lax.map while-loop
disappears and a (B, M, R) workspace appears as the largest intermediate)
trips it (VERDICT r3 weak #9 / next #9).

Regenerate intentionally after a deliberate graph change:
    PYTHONPATH= JAX_PLATFORMS=cpu python tools/hlo_canary.py --update
"""

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE_PATH = os.path.join(REPO, "tools", "hlo_canary.json")

# tiny shapes: op-class structure is shape-independent; tracing stays fast
BATCH, CANVAS, MAX_INST = 2, 128, 8

OP_CLASSES = ("while", "sort", "scatter", "gather", "convolution",
              "dot_general", "dynamic_slice", "iota")

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "i64": 8, "ui64": 8,
                "i32": 4, "ui32": 4, "i16": 2, "ui16": 2, "i8": 1, "ui8": 1,
                "i1": 1, "pred": 1}


def flagship_metrics():
    sys.path.insert(0, REPO)
    import jax

    from __graft_entry__ import _cfg
    from lgd_tpu.data import make_synthetic_batch
    from lgd_tpu.engine import make_train_step
    from lgd_tpu.models.distillator import build_model
    import jax.numpy as jnp

    cfg = _cfg(depth=50, max_inst=MAX_INST, attn_impl="reference")
    model = build_model(cfg, dtype=jnp.bfloat16)
    batch = make_synthetic_batch(batch_size=BATCH, canvas_hw=(CANVAS, CANVAS),
                                 max_instances=MAX_INST, seed=0)
    init_state, train_step = make_train_step(cfg, model)
    state = jax.eval_shape(init_state, jax.random.PRNGKey(0), batch)
    text = jax.jit(train_step).lower(state, batch).as_text()

    counts = {}
    for op in OP_CLASSES:
        counts[op] = len(re.findall(rf"stablehlo\.{op}\b", text))

    # largest tensor type mentioned anywhere in the program
    biggest = 0
    for m in re.finditer(r"tensor<((?:\d+x)+)(\w+)>", text):
        dims, dt = m.group(1), m.group(2)
        n = 1
        for d in dims.strip("x").split("x"):
            n *= int(d)
        biggest = max(biggest, n * _DTYPE_BYTES.get(dt, 4))

    return {
        "config": {"batch": BATCH, "canvas": CANVAS,
                   "max_instances": MAX_INST, "arch": "DistillatorRetinaNet",
                   "depth": 50},
        "op_counts": counts,
        "largest_tensor_bytes": biggest,
        "total_ops": len(re.findall(r"stablehlo\.\w+", text)),
    }


def main():
    metrics = flagship_metrics()
    print(json.dumps(metrics, indent=2))
    if "--update" in sys.argv:
        with open(BASELINE_PATH, "w") as f:
            json.dump(metrics, f, indent=2)
            f.write("\n")
        print(f"wrote {BASELINE_PATH}", file=sys.stderr)


if __name__ == "__main__":
    main()
