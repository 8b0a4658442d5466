#!/usr/bin/env python
"""LGD-TPU training CLI — mirrors the reference entry point
(/root/reference/train.py:237-310):

    python train.py --config-file configs/....yaml [--resume] [--eval-only]
        [--num-gpus N] [opts KEY VALUE ...]

The reference YAMLs load unchanged; META_ARCHITECTURE is auto-prefixed with
'Distillator' (train.py:247-248). --num-gpus is accepted for CLI parity but
parallelism comes from the visible TPU devices (one SPMD program over a
'data' mesh replaces detectron2 launch + DDP).
"""

import argparse
import logging
import os
import sys


def default_argument_parser():
    p = argparse.ArgumentParser(description="LGD-TPU training")
    p.add_argument("--config-file", default="", metavar="FILE")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--num-gpus", type=int, default=1,
                   help="accepted for reference-CLI parity; device count "
                        "comes from jax.devices()")
    p.add_argument("--num-machines", type=int, default=1)
    p.add_argument("--machine-rank", type=int, default=0)
    p.add_argument("--dist-url", default="auto")
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                   help="'KEY VALUE' config overrides")
    return p


def setup(args):
    from lgd_tpu.config import get_cfg

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if "Distillator" not in cfg.MODEL.META_ARCHITECTURE:
        cfg.MODEL.META_ARCHITECTURE = "Distillator" + cfg.MODEL.META_ARCHITECTURE
    cfg.merge_from_list(args.opts or [])
    cfg.freeze()

    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s %(name)s]: %(message)s",
        handlers=[
            logging.StreamHandler(sys.stdout),
            logging.FileHandler(os.path.join(cfg.OUTPUT_DIR, "log.txt")),
        ],
        force=True,  # jax/absl configure the root logger first
    )
    with open(os.path.join(cfg.OUTPUT_DIR, "config.yaml"), "w") as f:
        f.write(cfg.dump())
    logging.getLogger(__name__).info("Running with config:\n%s", cfg.dump())
    return cfg


def maybe_init_distributed(args):
    """Multi-host: the TPU-native replacement for detectron2 launch +
    dist_url bootstrap (reference train.py:296-310). With JAX the SPMD
    program spans all hosts after jax.distributed.initialize; env vars
    (COORDINATOR_ADDRESS etc.) or TPU metadata drive discovery."""
    if args.num_machines > 1 or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize()


def main(args):
    maybe_init_distributed(args)
    import jax.numpy as jnp

    from lgd_tpu.engine.trainer import do_test, do_train
    from lgd_tpu.models.distillator import build_model

    cfg = setup(args)
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    model = build_model(cfg, dtype=dtype)

    if args.eval_only:
        import jax

        from lgd_tpu.data.loader import TrainLoader  # noqa: F401
        from lgd_tpu.engine.checkpoint import Checkpointer
        from lgd_tpu.engine.train_step import make_train_step
        from lgd_tpu.data import make_synthetic_batch

        # build a state template to restore into
        batch = make_synthetic_batch(batch_size=1, canvas_hw=(256, 256),
                                     max_instances=cfg.TPU.MAX_INSTANCES)
        init_state, _ = make_train_step(cfg, model)
        state = init_state(jax.random.PRNGKey(0), batch)
        ckpt = Checkpointer(cfg.OUTPUT_DIR)
        if ckpt.latest_step() is not None:
            state, _ = ckpt.resume_or_load(state, resume=True)
        elif cfg.MODEL.WEIGHTS:
            # no prior run in OUTPUT_DIR: evaluate cfg.MODEL.WEIGHTS
            # directly, like the reference (train.py:267-270) — a full
            # TrainState checkpoint dir, a converted-.npz variables dump,
            # or a torch/d2 backbone file
            from lgd_tpu.engine.checkpoint import load_weights

            if (os.path.isdir(cfg.MODEL.WEIGHTS)
                    or cfg.MODEL.WEIGHTS.endswith(".npz")):
                state = load_weights(cfg.MODEL.WEIGHTS, state)
            else:
                from lgd_tpu.utils.weight_convert import maybe_load_pretrained

                state = maybe_load_pretrained(cfg, state)
        variables = {"params": state.params}
        if state.frozen:
            variables["frozen"] = state.frozen
        if cfg.MODEL.DISTILLATOR.EVAL_TEACHER:
            do_test(cfg, model, variables, eval_teacher=True)
        return do_test(cfg, model, variables)

    state = do_train(cfg, model, resume=args.resume)
    variables = {"params": state.params}
    if state.frozen:
        variables["frozen"] = state.frozen
    if cfg.MODEL.DISTILLATOR.EVAL_TEACHER:
        do_test(cfg, model, variables, eval_teacher=True)
    return do_test(cfg, model, variables)


if __name__ == "__main__":
    main(default_argument_parser().parse_args())
