import glob
import os

import pytest

from lgd_tpu.config import get_cfg

REF_CONFIG_DIR = "/root/reference/configs"


def test_defaults_tree():
    cfg = get_cfg()
    assert cfg.MODEL.DISTILLATOR.TEACHER.INTERACT_PATTERN == "stuGuided"
    assert cfg.MODEL.FCOS.FPN_STRIDES == [8, 16, 32, 64, 128]
    assert cfg.MODEL.SHIFT_GENERATOR.NUM_SHIFTS == 1
    assert cfg.NUM_CLASSES == 80


def test_merge_from_list_coercion():
    cfg = get_cfg()
    cfg.merge_from_list(["SOLVER.MAX_ITER", "1234", "MODEL.MASK_ON", "True"])
    assert cfg.SOLVER.MAX_ITER == 1234
    assert cfg.MODEL.MASK_ON is True


def test_freeze():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SOLVER.MAX_ITER = 1


def test_unknown_key_rejected():
    cfg = get_cfg()
    with pytest.raises(AssertionError):
        cfg.merge_from_list(["SOLVER.NO_SUCH_KEY", "1"])


@pytest.mark.skipif(not os.path.isdir(REF_CONFIG_DIR), reason="reference absent")
@pytest.mark.parametrize(
    "path",
    sorted(glob.glob(os.path.join(REF_CONFIG_DIR, "**", "*.yaml"), recursive=True)),
    ids=lambda p: os.path.relpath(p, REF_CONFIG_DIR),
)
def test_all_reference_yamls_load(path):
    """Every YAML shipped with the reference must merge unchanged
    (BASELINE.json: 'reference configs run unchanged')."""
    cfg = get_cfg()
    cfg.merge_from_file(path)
    # auto-prefix behavior from reference train.py:247-248
    if "Distillator" not in cfg.MODEL.META_ARCHITECTURE:
        cfg.MODEL.META_ARCHITECTURE = "Distillator" + cfg.MODEL.META_ARCHITECTURE
    cfg.freeze()
    assert cfg.MODEL.META_ARCHITECTURE.startswith("Distillator")


def test_base_retinanet_anchor_sizes_eval_tag():
    cfg = get_cfg()
    base = os.path.join(REF_CONFIG_DIR, "Base-RetinaNet.yaml")
    if not os.path.exists(base):
        pytest.skip("reference absent")
    cfg.merge_from_file(base)
    sizes = cfg.MODEL.ANCHOR_GENERATOR.SIZES
    assert len(sizes) == 5 and len(sizes[0]) == 3
    assert abs(sizes[0][0] - 32) < 1e-6
    assert abs(sizes[0][1] - 32 * 2 ** (1 / 3)) < 1e-6
