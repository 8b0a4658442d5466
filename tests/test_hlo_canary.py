"""HLO canary (VERDICT r3 #9): the flagship train step's StableHLO op-class
structure must match the checked-in baseline. Catches silent perf-regression
classes on CPU — e.g. the r3-573dc39 vmap-assignment regression removes the
lax.map while loop and materializes a (B, M, R) workspace as the largest
intermediate. After a DELIBERATE graph change regenerate with:

    PYTHONPATH= JAX_PLATFORMS=cpu python tools/hlo_canary.py --update
"""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.fixture(scope="module")
def current():
    import hlo_canary

    return hlo_canary.flagship_metrics()


def _baseline():
    path = os.path.join(REPO, "tools", "hlo_canary.json")
    with open(path) as f:
        return json.load(f)


def test_op_class_counts_match_baseline(current):
    want = _baseline()
    assert current["config"] == want["config"], (
        "canary config changed; regenerate the baseline")
    assert current["op_counts"] == want["op_counts"], (
        "HLO op-class drift vs tools/hlo_canary.json — if deliberate, rerun "
        "tools/hlo_canary.py --update and re-bench on-chip")


def test_largest_intermediate_and_total_ops(current):
    want = _baseline()
    assert current["largest_tensor_bytes"] == want["largest_tensor_bytes"], (
        "largest intermediate changed (a materialized batched workspace?)")
    lo, hi = 0.8 * want["total_ops"], 1.2 * want["total_ops"]
    assert lo <= current["total_ops"] <= hi, (
        current["total_ops"], want["total_ops"])
