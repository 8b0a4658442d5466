"""Benchmark: LGD train-step throughput on one TPU chip. Prints ONE JSON
line; the primary metric is the flagship LGD RetinaNet-R50 train step, with
a per-config table (FCOS-R50, Faster R-CNN-R50, eval path) and measured MFU
in "detail".

Baseline (vs_baseline denominator): the reference publishes no throughput
numbers (BASELINE.md). Estimate for 8x RTX 2080 Ti, global batch 16
(reference hardware, README.md:13): detectron2 RetinaNet-R50 1x trains at
~0.25 s/iter on 8 V100s; 2080 Ti is ~0.6x V100 and LGD adds the teacher
forward + second head pass + distill backward (~1.7x step cost per the
paper's +51%-savings-vs-FGFI framing), giving ~0.45 s/iter for 16 images =
~4.4 images/s per GPU. vs_baseline = (images/s/chip on this TPU) / 4.4.

MFU: per-step FLOPs from the compiled executable's XLA cost analysis over
the measured step time, against the chip's peak bf16 FLOP/s.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_IMG_PER_S_PER_GPU = 4.4

# peak dense bf16 FLOP/s per chip — most specific prefixes FIRST
# ("TPU v5 lite" must not match the "TPU v5"/v5p row)
PEAK_FLOPS = [
    ("TPU v5 lite", 197e12),  # v5e
    ("TPU v5e", 197e12),
    ("TPU v6 lite", 918e12),  # v6e / Trillium
    ("TPU v6e", 918e12),
    ("TPU v5p", 459e12),
    ("TPU v5", 459e12),
    ("TPU v4", 275e12),
]


def _peak_flops():
    kind = jax.devices()[0].device_kind
    for k, v in PEAK_FLOPS:
        if kind.lower().startswith(k.lower()):
            return v, kind
    return 197e12, kind  # assume v5e-class if unknown


def _ref_cfg(yaml_glob, extra=()):
    """Build straight from a reference YAML (the product claim: they run
    unchanged)."""
    import glob

    from lgd_tpu.config import get_cfg

    paths = sorted(glob.glob(yaml_glob))
    if not paths:
        raise FileNotFoundError(yaml_glob)
    cfg = get_cfg()
    cfg.merge_from_file(paths[0])
    if "Distillator" not in cfg.MODEL.META_ARCHITECTURE:
        cfg.MODEL.META_ARCHITECTURE = ("Distillator"
                                       + cfg.MODEL.META_ARCHITECTURE)
    cfg.merge_from_list(["TPU.MAX_INSTANCES", "32"] + list(extra))
    cfg.freeze()
    return cfg


def _flops_of(lowered_compiled):
    try:
        ca = lowered_compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def _bench_train(cfg, batch_size, canvas, n_steps=10, with_masks=False):
    from lgd_tpu.data import make_synthetic_batch
    from lgd_tpu.engine import make_train_step
    from lgd_tpu.models.distillator import build_model

    model = build_model(cfg, dtype=jnp.bfloat16)
    batch = make_synthetic_batch(batch_size=batch_size,
                                 canvas_hw=(canvas, canvas),
                                 max_instances=32, seed=0,
                                 with_masks=with_masks)
    init_state, train_step = make_train_step(cfg, model)
    # init at a TINY canvas: no param depends on the spatial dims, and the
    # init program is its own remote compile — measured 485 s at the bench
    # shapes vs ~40 s tiny (the actual train-step compile is only ~80 s;
    # this is what kept zeroing the driver's 900 s primary-row budget)
    tiny = make_synthetic_batch(batch_size=1, canvas_hw=(128, 128),
                                max_instances=32, seed=0,
                                with_masks=with_masks)
    # jit the init too: eager flax init dispatches hundreds of individual
    # ops, each a remote-compile round trip on the tunnel
    state = jax.jit(init_state)(jax.random.PRNGKey(0), tiny)
    # BENCH_NO_DONATE=1: retry knob for an axon tunnel-client panic
    # ("index out of bounds" in loaded_executable_execute) triggered by the
    # donation alias table of some executables (poto_hungarian, round 4);
    # the step then keeps both param copies live but executes correctly.
    donate = (0,) if os.environ.get("BENCH_NO_DONATE") != "1" else ()
    jstep = jax.jit(train_step, donate_argnums=donate)
    compiled = jstep.lower(state, batch).compile()
    flops = _flops_of(compiled)

    state, m = jstep(state, batch)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = jstep(state, batch)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / n_steps
    del state, m, batch, jstep, compiled
    return dt, flops


def _release_device_memory():
    """Free executables + buffers between rows so one chip fits the whole
    table (each row's params/opt-states would otherwise accumulate)."""
    import gc

    gc.collect()
    jax.clear_caches()
    gc.collect()


def _bench_eval(cfg, batch_size, canvas):
    from lgd_tpu.data import make_synthetic_batch
    from lgd_tpu.engine import make_train_step
    from lgd_tpu.models.distillator import build_model

    model = build_model(cfg, dtype=jnp.bfloat16)
    batch = make_synthetic_batch(batch_size=batch_size,
                                 canvas_hw=(canvas, canvas),
                                 max_instances=32, seed=0)
    init_state, _ = make_train_step(cfg, model)
    tiny = make_synthetic_batch(batch_size=1, canvas_hw=(128, 128),
                                max_instances=32, seed=0)
    state = jax.jit(init_state)(jax.random.PRNGKey(0), tiny)
    variables = {"params": state.params}
    if state.frozen:
        variables["frozen"] = state.frozen

    @jax.jit
    def infer(variables, image, image_size, gt):
        return model.apply(variables, image, image_size, gt, False,
                           method=model.inference)

    out = infer(variables, batch["image"], batch["image_size"], batch["gt"])
    jax.block_until_ready(out)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = infer(variables, batch["image"], batch["image_size"],
                    batch["gt"])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


REF = "/root/reference/configs/Distillation"


CANVAS = 640

# name -> (yaml glob, config overrides, batch ladder). Heavy rows start
# at batch 8: every OOM attempt costs a full (remote) compile, and the
# reference itself trains R-CNN at 2 img/GPU. The reference ships no POTO
# YAML; the POTO rows reuse the FCOS base (same backbone/solver family,
# thirdparty_heads/poto.py shares the FCOS tower) and quantify the
# Hungarian host-callback's step-time cost vs the on-device greedy variant.
# optional 4th element: per-row canvas override (default CANVAS).
ROWS = {
    "lgd_retinanet_r50": (f"{REF}/RetinaNet/retinanet_R_50*.yaml", (),
                          (16, 8, 4)),
    # primary-metric fallback (VERDICT r3 #1b): a reduced-scope flagship row
    # (batch 8, 512^2) run ONLY if the full-size primary produced nothing in
    # its slot, so a pathological remote compile can't zero the round again.
    "lgd_retinanet_r50_small": (f"{REF}/RetinaNet/retinanet_R_50*.yaml", (),
                                (8,), 512),
    "lgd_fcos_r50": (f"{REF}/FCOS/fcos_R_50*.yaml", (), (16, 8, 4)),
    "lgd_faster_rcnn_r50": (f"{REF}/FasterRCNN/faster_rcnn_R_50*.yaml",
                            ("MODEL.RPN.POST_NMS_TOPK_TRAIN", "512"),
                            (8, 4)),
    "lgd_retinanet_r101_dcnv2": (
        f"{REF}/RetinaNet/retinanet_R_101_dcnv2*.yaml", (), (8, 4)),
    "lgd_retinanet_swin_t": (
        f"{REF}/RetinaNet/retinanet_Swin_Tiny*.yaml", (), (8, 4)),
    "lgd_retinanet_r50_eval": (f"{REF}/RetinaNet/retinanet_R_50*.yaml", (),
                               (8,)),
    # the reference's Mask R-CNN headline (README.md:48: Swin-T 3xMS,
    # box 46.4 / mask 42.5); MASK_ON routes synthetic GT bitmasks in.
    "lgd_mask_rcnn_swin_t": (f"{REF}/MaskRCNN/mask_rcnn_Swin*.yaml",
                             ("MODEL.RPN.POST_NMS_TOPK_TRAIN", "512"),
                             (8, 4)),
    "lgd_poto_r50_hungarian": (
        f"{REF}/FCOS/fcos_R_50*.yaml",
        ("MODEL.META_ARCHITECTURE", "DistillatorPOTO",
         "MODEL.POTO.ASSIGNMENT", "hungarian"), (8,)),
    "lgd_poto_r50_greedy": (
        f"{REF}/FCOS/fcos_R_50*.yaml",
        ("MODEL.META_ARCHITECTURE", "DistillatorPOTO",
         "MODEL.POTO.ASSIGNMENT", "greedy"), (8,)),
}


def _run_row(name):
    """Compute one table row; returns (row, errors, device_kind, peak)."""
    peak, device_kind = _peak_flops()
    spec = ROWS[name]
    pattern, extra, ladder = spec[:3]
    canvas = spec[3] if len(spec) > 3 else CANVAS
    errors = {}
    if name.endswith("_eval"):
        cfg = _ref_cfg(pattern, extra)
        dt = _bench_eval(cfg, ladder[0], canvas)
        return ({"imgs_per_sec_per_chip": round(ladder[0] / dt, 2),
                 "step_ms": round(dt * 1000, 1), "batch_size": ladder[0]},
                errors, device_kind, peak)
    for batch_size in ladder:
        try:
            _release_device_memory()
            cfg = _ref_cfg(pattern, extra)
            dt, flops = _bench_train(cfg, batch_size, canvas,
                                     with_masks=bool(cfg.MODEL.MASK_ON))
            row = {
                "imgs_per_sec_per_chip": round(batch_size / dt, 2),
                "step_ms": round(dt * 1000, 1),
                "batch_size": batch_size,
                "canvas": canvas,
            }
            if flops:
                row["tflops_per_step"] = round(flops / 1e12, 2)
                row["mfu"] = round(flops / dt / peak, 4)
            return row, errors, device_kind, peak
        except Exception as e:  # noqa: BLE001 - smaller batch fallback
            errors[f"{name}@bs{batch_size}"] = (
                f"{type(e).__name__}: {e}"[:200])
    return None, errors, device_kind, peak


def main():
    # --row NAME: single-row worker mode (one JSON line). The parent is a
    # pure orchestrator: it never initializes a jax backend, because only
    # ONE process can hold the TPU tunnel at a time — every row (primary
    # included) runs sequentially in its own time-boxed subprocess, so one
    # pathological remote compile (Swin/DCNv2/R-CNN graphs have hit tens
    # of minutes) cannot starve the primary metric. stderr = progress only.
    # NOTE: do NOT enable the persistent JAX compilation cache here — with
    # the axon remote-compile tunnel it more than doubles compile time
    # (measured: the primary row went from ~5 min to >15 min and every row
    # timed out), so each process pays its plain compiles instead.
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

    # --rows a,b,c: worker mode. Runs the named rows sequentially IN ONE
    # process (fresh processes pay ~3 min of tunnel/runtime warmup per row)
    # and streams one JSON line per completed row, so the parent keeps
    # whatever finished even if it must kill the worker.
    if len(sys.argv) == 3 and sys.argv[1] == "--rows":
        for name in sys.argv[2].split(","):
            row, errs, device_kind, peak = _run_row(name)
            print(json.dumps({"name": name, "row": row, "errors": errs,
                              "device": device_kind, "peak": peak}),
                  flush=True)
            print(f"bench: row {name} done", file=sys.stderr, flush=True)
        return

    import subprocess

    table = {}
    errors = {}
    device_kind = None
    peak = 197e12

    def ingest(stdout_text):
        nonlocal device_kind, peak
        for line in (stdout_text or "").splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                out = json.loads(line)
            except ValueError:
                continue
            if out.get("row"):
                table[out["name"]] = out["row"]
            errors.update(out.get("errors") or {})
            device_kind = out.get("device") or device_kind
            peak = out.get("peak") or peak

    def emit():
        """Print the full result line NOW and flush. Called after every
        group: the driver keeps the LAST parseable stdout line, so a later
        timeout can only lose not-yet-benched extras, never what already
        ran (round-2 lesson: BENCH_r02.json was rc=124/parsed:null because
        the single JSON line was printed only at the very end)."""
        primary = table.get("lgd_retinanet_r50")
        # A fallback row is a DIFFERENT configuration (batch 8, 512^2):
        # emit it under its own metric name so round-over-round comparisons
        # of the true primary can never silently conflate the two (a smaller
        # canvas yields higher img/s). The true primary stays absent, with
        # an explanatory error field.
        metric = "lgd_retinanet_r50_train_imgs_per_sec_per_chip"
        extra_fields = {}
        if primary is None and table.get("lgd_retinanet_r50_small"):
            primary = dict(table["lgd_retinanet_r50_small"])
            metric = ("lgd_retinanet_r50_small_bs8_512"
                      "_train_imgs_per_sec_per_chip")
            extra_fields["fallback_for"] = (
                "lgd_retinanet_r50_train_imgs_per_sec_per_chip (full-size "
                "primary did not finish in its slot; NOT comparable to it "
                "— smaller canvas inflates img/s)")
        if primary is None:
            print(json.dumps({
                "metric": "lgd_retinanet_r50_train_imgs_per_sec_per_chip",
                "value": 0.0, "unit": "images/sec/chip", "vs_baseline": 0.0,
                "error": json.dumps(errors)[:800],
            }), flush=True)
            return
        img_s = primary["imgs_per_sec_per_chip"]
        print(json.dumps({
            "metric": metric,
            "value": img_s,
            "unit": "images/sec/chip",
            "vs_baseline": round(img_s / BASELINE_IMG_PER_S_PER_GPU, 2),
            **extra_fields,
            "detail": {
                "device": device_kind,
                "peak_bf16_tflops": round(peak / 1e12, 1),
                "canvas": CANVAS,
                "table": table,
                "errors": errors or None,
            },
        }), flush=True)
        _write_bench_table(table, errors, device_kind, peak)

    def run_group(names, timeout_s):
        print(f"bench: rows {names} (timeout {int(timeout_s)}s)",
              file=sys.stderr, flush=True)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--rows",
                 ",".join(names)],
                capture_output=True, text=True, timeout=timeout_s,
            )
            ingest(r.stdout)
            if r.returncode != 0 and any(n not in table for n in names):
                # worker crashed (OOM / tunnel-client panic): retry the
                # missing rows once without buffer donation — the axon
                # client's donation alias handling panicked on the
                # poto_hungarian executable in round 4
                missing = [n for n in names if n not in table]
                print(f"bench: worker rc={r.returncode}; retrying "
                      f"{missing} with BENCH_NO_DONATE=1",
                      file=sys.stderr, flush=True)
                env = dict(os.environ, BENCH_NO_DONATE="1")
                r2 = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--rows",
                     ",".join(missing)],
                    capture_output=True, text=True, timeout=timeout_s,
                    env=env)
                ingest(r2.stdout)
                for n in names:
                    if n not in table:
                        errors.setdefault(
                            n, f"worker rc={r.returncode}, no-donate retry "
                               f"rc={r2.returncode}: "
                               + (r2.stderr or r.stderr or "")[-300:])
        except subprocess.TimeoutExpired as e:
            out = e.output
            ingest(out.decode() if isinstance(out, bytes) else out)
            for n in names:
                if n not in table:
                    errors.setdefault(n, f"worker killed at {timeout_s}s "
                                         "before this row finished")
        except Exception as e:  # noqa: BLE001
            for n in names:
                errors.setdefault(n, f"{type(e).__name__}: {e}"[:200])
        emit()

    # The primary metric gets its own guaranteed slot and its result line
    # is flushed before any extra row starts; extras run in small groups,
    # each followed by a refreshed (superset) result line. Groups hold 1-2
    # rows: remote compiles for R-CNN / DCNv2 / POTO graphs run 8-15 min
    # each, so a 3-row group loses its tail to the budget (round-3 lesson:
    # faster_rcnn + dcnv2 + poto_hungarian were all killed mid-compile in
    # 3-row groups while every 1-2 row group completed).
    scale = float(os.environ.get("BENCH_EXTRA_BUDGET_S", 900)) / 900.0
    run_group(["lgd_retinanet_r50"], 900 * scale)
    if table.get("lgd_retinanet_r50") is None:
        # reduced-scope insurance for the primary metric (VERDICT r3 #1b)
        run_group(["lgd_retinanet_r50_small"], 600 * scale)
    for group, budget in (
        (["lgd_faster_rcnn_r50"], 1200),
        (["lgd_retinanet_r101_dcnv2"], 1200),
        (["lgd_fcos_r50", "lgd_retinanet_r50_eval"], 900),
        (["lgd_retinanet_swin_t"], 900),
        (["lgd_mask_rcnn_swin_t"], 1200),
        (["lgd_poto_r50_hungarian"], 1200),
        (["lgd_poto_r50_greedy"], 1200),
    ):
        run_group(group, budget * scale)

    if (table.get("lgd_retinanet_r50") is None
            and table.get("lgd_retinanet_r50_small") is None):
        sys.exit(1)


def _write_bench_table(table, errors, device_kind, peak):
    """Persist every completed row to BENCH_TABLE.md so the perf record
    survives independently of the driver's JSON capture.

    MERGE-on-write: rows are accumulated in BENCH_ROWS.json (with the date
    each row last ran) and the markdown is regenerated from the union — a
    driver run whose budget only fits the first few rows can no longer
    clobber the slower rows recorded by an earlier full run (round-4
    lesson: the driver's 3-row window rewrote the committed 8-row table)."""
    try:
        import datetime

        root = os.path.dirname(os.path.abspath(__file__))
        jpath = os.path.join(root, "BENCH_ROWS.json")
        rows = {}
        if os.path.exists(jpath):
            try:
                with open(jpath) as f:
                    rows = json.load(f)
            except ValueError:
                rows = {}
        today = datetime.date.today().isoformat()
        for name, row in table.items():
            rows[name] = dict(row, recorded=today)
        with open(jpath, "w") as f:
            json.dump(rows, f, indent=1, sort_keys=True)

        lines = [
            "# Bench table (auto-written by bench.py; rows merged across"
            " runs via BENCH_ROWS.json)", "",
            f"Device: {device_kind} (peak bf16 {peak / 1e12:.0f} TFLOP/s); "
            f"canvas {CANVAS}x{CANVAS}; synthetic batches, 32 instances.", "",
            "| row | img/s/chip | step ms | batch | canvas | TFLOPs/step"
            " | MFU | recorded |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for name, row in sorted(rows.items()):
            lines.append(
                "| {} | {} | {} | {} | {} | {} | {} | {} |".format(
                    name, row.get("imgs_per_sec_per_chip", "-"),
                    row.get("step_ms", "-"), row.get("batch_size", "-"),
                    row.get("canvas", CANVAS),
                    row.get("tflops_per_step", "-"),
                    ("{:.1%}".format(row["mfu"]) if "mfu" in row else "-"),
                    row.get("recorded", "-")))
        if errors:
            lines += ["", "Errors (this run):", ""]
            lines += [f"- `{k}`: {v}" for k, v in sorted(errors.items())]
        with open(os.path.join(root, "BENCH_TABLE.md"), "w") as f:
            f.write("\n".join(lines) + "\n")
    except Exception as e:  # noqa: BLE001 - never let reporting kill bench
        print(f"bench: BENCH_TABLE.md write failed: {e}", file=sys.stderr,
              flush=True)


if __name__ == "__main__":
    main()
