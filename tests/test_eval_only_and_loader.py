"""--eval-only weights resolution (reference train.py:267-270 evaluates
cfg.MODEL.WEIGHTS directly) + TestLoader unreadable-image handling
(VERDICT r3 missing #4 / weak #5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from lgd_tpu.config import get_cfg
from lgd_tpu.data import make_synthetic_batch
from lgd_tpu.engine.checkpoint import (
    Checkpointer,
    load_weights,
    save_variables_npz,
)
from lgd_tpu.engine.train_step import make_train_step
from lgd_tpu.models.distillator import build_model


def _tiny_cfg():
    import __graft_entry__ as ge

    return ge._cfg(depth=18, max_inst=4, tiny=True, attn_impl="reference")


def _template_state(cfg):
    model = build_model(cfg, dtype=jnp.float32)
    batch = make_synthetic_batch(batch_size=1, canvas_hw=(64, 64),
                                 max_instances=4, seed=0)
    init_state, _ = make_train_step(cfg, model)
    return init_state(jax.random.PRNGKey(0), batch)


def _tree_equal(a, b):
    eq = jax.tree.map(lambda x, y: bool(np.array_equal(x, y)), a, b)
    return all(jax.tree.leaves(eq))


def test_eval_only_weights_from_npz(tmp_path):
    cfg = _tiny_cfg()
    trained = _template_state(cfg)
    # a "converted weights file": full variables as one npz
    path = str(tmp_path / "model_final.npz")
    save_variables_npz(path, trained.params, trained.frozen)

    fresh = _template_state(cfg)
    fresh = fresh.replace(
        params=jax.tree.map(lambda x: x * 0.0 + 7.0, fresh.params))
    assert not _tree_equal(fresh.params, trained.params)
    loaded = load_weights(path, fresh)
    assert _tree_equal(loaded.params, trained.params)
    assert _tree_equal(loaded.frozen, trained.frozen)


def test_eval_only_weights_from_checkpoint_dir(tmp_path):
    """MODEL.WEIGHTS pointing at a previous run's OUTPUT_DIR (or its
    checkpoints/ subdir) restores the full TrainState without any prior
    training in the current OUTPUT_DIR."""
    cfg = _tiny_cfg()
    trained = _template_state(cfg)
    run_a = str(tmp_path / "run_a")
    ckpt = Checkpointer(run_a)
    ckpt.save(3, jax.device_get(trained))
    ckpt.wait()

    fresh = _template_state(cfg)
    fresh = fresh.replace(
        params=jax.tree.map(lambda x: x * 0.0 - 1.0, fresh.params))
    loaded = load_weights(run_a, fresh)
    assert _tree_equal(loaded.params, trained.params)
    loaded2 = load_weights(os.path.join(run_a, "checkpoints"), fresh)
    assert _tree_equal(loaded2.params, trained.params)


def test_test_loader_skips_unreadable_image():
    """An unreadable image file must become a meta=None slot (like padding),
    never reach the evaluator with image_id=None (VERDICT r3 weak #5); the
    schedule stays intact so multi-process lockstep is preserved."""
    from lgd_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from lgd_tpu.data.loader import TestLoader

    rng = np.random.RandomState(0)
    dicts = []
    for i in range(3):
        d = {
            "height": 48, "width": 64, "image_id": i + 1,
            "annotations": [{
                "bbox": [4.0, 4.0, 20.0, 20.0], "bbox_mode": "XYWH_ABS",
                "category_id": 0, "iscrowd": 0,
            }],
        }
        if i == 1:
            d["file_name"] = "/nonexistent/broken_image.jpg"
        else:
            d["image"] = rng.uniform(0, 255, (48, 64, 3)).astype(np.float32)
        dicts.append(d)
    name = "unreadable_eval_split"
    try:
        DatasetCatalog.register(name, lambda: dicts)
        MetadataCatalog.get(name).update(evaluator_type="coco")
    except KeyError:
        pass

    cfg = get_cfg()
    cfg.DATASETS.TEST = (name,)
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.INPUT.MAX_SIZE_TEST = 64
    cfg.TPU.MAX_INSTANCES = 4
    cfg.freeze()

    loader = TestLoader(cfg, name, batch_size=3)
    batches = list(loader)
    assert len(batches) == 1
    meta = batches[0]["_meta"]
    assert meta[1] is None, "unreadable slot must look like padding"
    assert meta[0] is not None and meta[2] is not None
    assert meta[0]["image_id"] == 1 and meta[2]["image_id"] == 3
