"""Benchmark: LGD (RetinaNet-R50 + DynamicTeacher) train-step throughput on
one TPU chip. Prints ONE JSON line.

Baseline (vs_baseline denominator): the reference publishes no throughput
numbers (BASELINE.md). Estimate for 8x RTX 2080 Ti, global batch 16
(reference hardware, README.md:13): detectron2 RetinaNet-R50 1x trains at
~0.25 s/iter on 8 V100s; 2080 Ti is ~0.6x V100 and LGD adds the teacher
forward + second head pass + distill backward (~1.7x step cost per the
paper's +51%-savings-vs-FGFI framing), giving ~0.45 s/iter for 16 images =
~4.4 images/s per GPU. vs_baseline = (images/s/chip on this TPU) / 4.4.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_IMG_PER_S_PER_GPU = 4.4


def main():
    from __graft_entry__ import _cfg
    from lgd_tpu.data import make_synthetic_batch
    from lgd_tpu.engine import make_train_step
    from lgd_tpu.models.distillator import build_model

    canvas = 640
    for batch_size in (16, 8, 4):
        try:
            cfg = _cfg(depth=50, max_inst=32)
            model = build_model(cfg, dtype=jnp.bfloat16)
            batch = make_synthetic_batch(
                batch_size=batch_size, canvas_hw=(canvas, canvas),
                max_instances=32, seed=0,
            )
            init_state, train_step = make_train_step(cfg, model)
            state = init_state(jax.random.PRNGKey(0), batch)
            jstep = jax.jit(train_step, donate_argnums=(0,))

            # warmup / compile
            state, m = jstep(state, batch)
            jax.block_until_ready(m)
            state, m = jstep(state, batch)
            jax.block_until_ready(m)

            n_steps = 10
            t0 = time.perf_counter()
            for _ in range(n_steps):
                state, m = jstep(state, batch)
            jax.block_until_ready(m)
            dt = (time.perf_counter() - t0) / n_steps
            img_s = batch_size / dt
            print(json.dumps({
                "metric": "lgd_retinanet_r50_train_imgs_per_sec_per_chip",
                "value": round(img_s, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_s / BASELINE_IMG_PER_S_PER_GPU, 2),
                "detail": {
                    "batch_size": batch_size,
                    "canvas": canvas,
                    "step_ms": round(dt * 1000, 1),
                    "device": str(jax.devices()[0]),
                },
            }))
            return
        except Exception as e:  # noqa: BLE001 - fall back to smaller batch
            last_err = f"{type(e).__name__}: {e}"
            continue
    print(json.dumps({
        "metric": "lgd_retinanet_r50_train_imgs_per_sec_per_chip",
        "value": 0.0,
        "unit": "images/sec/chip",
        "vs_baseline": 0.0,
        "error": last_err[:500],
    }))
    sys.exit(1)


if __name__ == "__main__":
    main()
