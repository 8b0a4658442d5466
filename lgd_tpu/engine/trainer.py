"""Training / evaluation drivers (host loop around the jitted step).

Equivalent of the reference's do_train / do_test / my_inference_on_dataset
(train.py:131-234, utils/build.py:426-487): plain iteration loop with
distill-phase scheduling (inside the compiled step here), periodic eval
including the teacher branch (EVAL_TEACHER), periodic checkpointing, metric
writers, and warmup-aware inference timing logs.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Dict, Optional

import jax

import numpy as np

from ..data.loader import TestLoader, TrainLoader
from ..evaluation import get_evaluator
from ..parallel.barrier import unique_barrier_name, wait_at_barrier
from ..parallel.mesh import make_mesh, shard_batch
from .checkpoint import Checkpointer, PeriodicCheckpointer
from .events import (
    CommonMetricPrinter,
    EventStorage,
    JSONWriter,
    TensorboardWriter,
)
from .train_step import jit_train_step, make_train_step

logger = logging.getLogger(__name__)


def _strip_meta(batch):
    return {k: v for k, v in batch.items() if not k.startswith("_")}


# (model, mesh) -> jitted inference fn. do_test runs every EVAL_PERIOD (and
# again for the teacher branch right after); a per-call closure would retrace
# and recompile the identical program each time. The cache keeps a strong ref
# to the model so id() keys can never be reused by a new object.
_INFER_CACHE = {}


def _get_infer(model, mesh):
    key = (id(model), tuple(mesh.devices.flat))
    hit = _INFER_CACHE.get(key)
    if hit is not None:
        return hit[1]
    if len(_INFER_CACHE) > 8:
        _INFER_CACHE.clear()
    bs = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())

    @functools.partial(jax.jit, static_argnums=(4,),
                       in_shardings=(rep, bs, bs, bs), out_shardings=rep)
    def infer(variables, image, image_size, gt, eval_teacher):
        return model.apply(variables, image, image_size, gt,
                           eval_teacher, method=model.inference)

    # Per-canvas-shape AOT compile with a multi-process barrier (see
    # parallel/barrier.py for why a barrier must follow each compile).
    # Bucketing is rank-invariant (TestLoader), so all ranks take the same
    # per-shape compile-miss sequence; the barrier name is derived from the
    # compile key (shape + branch) plus a per-key counter, so even ranks
    # with different *overall* miss orders (e.g. after a cache clear) line
    # up at the same name for the same compile event.
    aot = {}

    def call(variables, image, image_size, gt, eval_teacher):
        k = (image.shape, eval_teacher)
        fn = aot.get(k)
        if fn is None:
            fn = infer.lower(variables, image, image_size, gt,
                             eval_teacher).compile()
            tag = "lgd_eval_compile_{}x{}_{}".format(
                image.shape[1], image.shape[2], int(bool(eval_teacher)))
            wait_at_barrier(unique_barrier_name(tag))
            aot[k] = fn
        # AOT executables (unlike jit dispatch) do NOT auto-reshard their
        # inputs: when do_train capped the mesh (TPU.TRAIN_DEVICES or batch
        # divisibility) the trained params are committed to an N<n_dev
        # device mesh and calling the full-mesh executable raises
        # "Compiled object called with input sharding that does not match".
        # device_put is a no-op when the sharding already matches.
        variables = jax.device_put(variables, rep)
        image = jax.device_put(image, bs)
        image_size = jax.device_put(image_size, bs)
        gt = jax.device_put(gt, bs)
        return fn(variables, image, image_size, gt)

    _INFER_CACHE[key] = (model, call)
    return call


def do_test(cfg, model, variables, eval_teacher: bool = False,
            batch_size: Optional[int] = None) -> Dict:
    """COCO evaluation of the current parameters; optionally routes teacher
    features through the student head (train.py:223-225 EVAL_TEACHER).

    Data-parallel by construction: images are batched ``batch_size`` (default
    = device count) per step and the inference jit shards the batch over a
    'data' mesh; across processes the dataset is pre-sharded rank::world
    (reference InferenceSampler, utils/build.py:369-412) and detections are
    allgathered before scoring."""
    from ..parallel.mesh import allgather_object

    rank, world = jax.process_index(), jax.process_count()
    n_dev = len(jax.devices())
    if batch_size is None:
        batch_size = max(1, n_dev // world) if world > 1 else n_dev
    mesh = make_mesh(("data",), devices=jax.devices()[: batch_size * world])
    infer = _get_infer(model, mesh)

    results = {}
    for dataset_name in cfg.DATASETS.TEST:
        loader = TestLoader(cfg, dataset_name, batch_size=batch_size,
                            rank=rank, world_size=world)
        # evaluator_type routing (reference get_evaluator, train.py:78-127)
        evaluator = get_evaluator(cfg, dataset_name)
        evaluator.reset()

        total = len(loader)
        num_warmup = min(5, max(total // batch_size - 1, 0))
        compute_time = 0.0
        n_timed_imgs = 0
        for idx, batch in enumerate(loader):
            if idx == num_warmup:
                compute_time = 0.0
                n_timed_imgs = 0
            t0 = time.perf_counter()
            # multi-process: every rank holds a (batch_size, ...) local
            # slice; assemble the (batch_size*world, ...) global arrays
            # before the lockstep jit (single-process: plain device_put)
            dev_batch = shard_batch(
                {k: batch[k] for k in ("image", "image_size", "gt")}, mesh)
            out = infer(variables, dev_batch["image"],
                        dev_batch["image_size"], dev_batch["gt"],
                        eval_teacher)
            out = jax.device_get(out)
            compute_time += time.perf_counter() - t0
            dets, mask_probs = out if isinstance(out, tuple) else (out, None)

            # this rank's slots within the global output batch
            off = rank * batch_size
            for i, meta in enumerate(batch["_meta"]):
                if meta is None:  # padded slot in the final partial batch
                    continue
                n_timed_imgs += 1
                ih, iw = meta["input_hw"]
                sx = meta["width"] / iw
                sy = meta["height"] / ih
                valid = np.asarray(dets.valid[off + i])
                boxes = np.asarray(dets.boxes[off + i])[valid]
                boxes = boxes * np.asarray([sx, sy, sx, sy])
                boxes[:, 0::2] = boxes[:, 0::2].clip(0, meta["width"])
                boxes[:, 1::2] = boxes[:, 1::2].clip(0, meta["height"])
                evaluator.process(
                    meta["image_id"], boxes,
                    np.asarray(dets.scores[off + i])[valid],
                    np.asarray(dets.classes[off + i])[valid],
                    masks=(np.asarray(mask_probs[off + i])[valid]
                           if mask_probs is not None else None),
                )
        logger.info(
            "Total inference pure compute time: %.6f s / img (%d imgs, "
            "batch=%d)", compute_time / max(n_timed_imgs, 1), total,
            batch_size,
        )
        if world > 1 and hasattr(evaluator, "detections_state"):
            states = allgather_object(evaluator.detections_state())
            for r, st in enumerate(states):
                if r != rank:
                    evaluator.merge_detections(st)
        iou_types = ("bbox", "segm") if cfg.MODEL.MASK_ON else ("bbox",)
        dump = (f"{cfg.OUTPUT_DIR}/inference/{dataset_name}"
                if cfg.OUTPUT_DIR and rank == 0 else None)
        results[dataset_name] = evaluator.evaluate(iou_types,
                                                   output_dir=dump)
        logger.info("Results[%s]: %s", dataset_name, results[dataset_name])
    if len(results) == 1:
        return next(iter(results.values()))
    return results


def do_train(cfg, model, resume: bool = False,
             loader: Optional[TrainLoader] = None):
    """The reference's plain training loop (train.py:148-234), with the
    phase schedule compiled into the step."""
    # mesh over the largest device count dividing the global batch
    # (the reference asserts divisibility, utils/build.py:282-285)
    rank, world = jax.process_index(), jax.process_count()
    if world > 1:
        # multi-process: the mesh must span every device of every process
        assert cfg.SOLVER.IMS_PER_BATCH % len(jax.devices()) == 0, (
            f"IMS_PER_BATCH={cfg.SOLVER.IMS_PER_BATCH} must divide over "
            f"{len(jax.devices())} global devices")
        n_dev = len(jax.devices())
    else:
        n_dev = len(jax.devices())
        if cfg.TPU.TRAIN_DEVICES > 0:
            # sub-slice training: cap the data mesh (also lets CPU-hosted
            # tests opt out of virtual-device collectives on a 1-core host)
            n_dev = min(n_dev, cfg.TPU.TRAIN_DEVICES)
        while cfg.SOLVER.IMS_PER_BATCH % n_dev:
            n_dev -= 1
        if n_dev != len(jax.devices()):
            logger.warning(
                "IMS_PER_BATCH=%d / TPU.TRAIN_DEVICES=%d: using %d of %d "
                "devices", cfg.SOLVER.IMS_PER_BATCH, cfg.TPU.TRAIN_DEVICES,
                n_dev, len(jax.devices()))
    mesh = make_mesh(("data",), devices=jax.devices()[:n_dev])
    if loader is None:
        # per-rank sampler shard, local batch = IMS_PER_BATCH / world
        # (reference TrainingSampler sharding, utils/build.py:351-352)
        loader = TrainLoader(cfg, rank=rank, world_size=world)

    init_state, train_step = make_train_step(cfg, model)

    it = iter(loader)
    first = next(it)
    # Initialize at a TINY canvas: no parameter depends on the spatial
    # dims, and the init program is its own (possibly remote) compile —
    # measured 485 s at batch 16 x 640^2 on the tunnel vs ~40 s tiny.
    # with_masks=True makes the tiny gt a field superset of any loader gt.
    from ..data import make_synthetic_batch

    tiny = make_synthetic_batch(
        batch_size=1, canvas_hw=(128, 128),
        max_instances=first["gt"].capacity, with_masks=True,
        segmask_stride=cfg.TPU.SEGMASK_STRIDE)
    # jit: eager flax init dispatches hundreds of individual ops, each a
    # remote-compile round trip under the TPU tunnel
    state = jax.jit(init_state)(jax.random.PRNGKey(max(cfg.SEED, 0)), tiny)

    # cold-start weights (detectron2:// pkl / converted torch) if present
    from ..utils.weight_convert import maybe_load_pretrained

    state = maybe_load_pretrained(cfg, state)

    ckpt = Checkpointer(cfg.OUTPUT_DIR)
    state, start_iter = ckpt.resume_or_load(state, resume=resume)
    max_iter = cfg.SOLVER.MAX_ITER
    periodic = PeriodicCheckpointer(ckpt, cfg.SOLVER.CHECKPOINT_PERIOD,
                                    max_iter)

    jstep = jit_train_step(train_step, mesh, _strip_meta(first))

    storage = EventStorage(start_iter)
    writers = [
        CommonMetricPrinter(max_iter),
        JSONWriter(f"{cfg.OUTPUT_DIR}/metrics.json"),
        TensorboardWriter(cfg.OUTPUT_DIR),
    ]

    # first-class step tracing (the reference has none — SURVEY.md §5):
    # TPU.PROFILE_DIR captures an xplane trace of a few steady-state steps.
    prof_dir = cfg.TPU.PROFILE_DIR
    prof_start = start_iter + cfg.TPU.PROFILE_START_ITER
    prof_stop = prof_start + cfg.TPU.PROFILE_NUM_ITERS

    logger.info("Starting training from iteration %d", start_iter)
    batch = first
    prev_total = None  # (iteration, device scalar) of the previous step
    for iteration in range(start_iter, max_iter):
        storage.iter = iteration
        if prof_dir and iteration == prof_start:
            jax.profiler.start_trace(prof_dir)
        state, metrics = jstep(state, shard_batch(_strip_meta(batch), mesh))
        # every-iteration divergence guard (reference asserts each step,
        # train.py:194). Checking the PREVIOUS step's total — already
        # computed by the time this step was dispatched — keeps the device
        # pipeline full while still catching NaN within one iteration,
        # before a second optimizer update can compound the corruption.
        if prev_total is not None:
            t = float(prev_total[1])
            assert np.isfinite(t), (
                f"Loss diverged at iteration {prev_total[0]}: total={t}")
        prev_total = (iteration, metrics["total_loss"])
        if prof_dir and iteration == prof_stop:
            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
            logger.info("Wrote profiler trace to %s", prof_dir)

        if (iteration + 1) % 20 == 0 or iteration == max_iter - 1:
            host_metrics = {k: float(v) for k, v in metrics.items()}
            total = host_metrics.get("total_loss", 0.0)
            assert np.isfinite(total), f"Loss diverged: {host_metrics}"
            storage.put_scalars(**host_metrics)
            for w in writers:
                w.write(storage)

        if (
            cfg.TEST.EVAL_PERIOD > 0
            and (iteration + 1) % cfg.TEST.EVAL_PERIOD == 0
            and iteration != max_iter - 1
        ):
            variables = {"params": state.params}
            if state.frozen:
                variables["frozen"] = state.frozen
            do_test(cfg, model, variables)
            if cfg.MODEL.DISTILLATOR.EVAL_TEACHER:
                logger.info("************** EVAL TEACHER ***************")
                do_test(cfg, model, variables, eval_teacher=True)

        if iteration == max_iter - 1:
            # the lagged guard never covers the last step; sync and check
            # it before the final checkpoint save can persist a NaN state
            t = float(metrics["total_loss"])
            assert np.isfinite(t), (
                f"Loss diverged at final iteration {iteration}: total={t}")
        periodic.step(iteration, state)
        batch = next(it)

    ckpt.wait()
    return state
