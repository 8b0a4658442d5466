"""POTO assignment: on-device exact Hungarian vs the scipy oracle, the
host-callback oracle path, and greedy-vs-Hungarian agreement on typical
quality surfaces."""

import jax
import jax.numpy as jnp
import numpy as np

from lgd_tpu.models.heads.poto import (
    INF,
    greedy_one_to_one,
    hungarian_host_one_to_one,
)
from lgd_tpu.ops.hungarian import linear_sum_assignment, max_quality_assignment


def device_hungarian(q_bmr):
    """(B, M, R) quality -> (B, M) assignment via the on-device solver."""
    return jax.vmap(lambda q: max_quality_assignment(q, penalty=-INF))(q_bmr)


def scipy_max_assignment(q):
    """(M, R) -> (M,) via scipy, with the same -INF filter as production."""
    from scipy.optimize import linear_sum_assignment as lsa

    rows, cols = lsa(q, maximize=True)
    out = np.full(q.shape[0], -1, np.int32)
    keep = q[rows, cols] > -INF / 2
    out[rows[keep]] = cols[keep].astype(np.int32)
    return out


def total_quality(q, assign):
    return sum(q[i, assign[i]] for i in range(q.shape[0]) if assign[i] >= 0)


def test_device_hungarian_matches_scipy_random():
    """Exact-optimality parity on random rectangular matrices: equal totals
    always; equal indices when the optimum is unique (generic floats)."""
    rng = np.random.RandomState(0)
    for trial in range(20):
        M = rng.randint(1, 12)
        R = rng.randint(M, 80)
        q = rng.rand(M, R).astype(np.float32)
        dev = np.asarray(device_hungarian(jnp.asarray(q)[None]))[0]
        ref = scipy_max_assignment(q.astype(np.float64))
        # generic random floats -> unique optimum -> identical assignment
        np.testing.assert_array_equal(dev, ref)


def test_device_hungarian_matches_scipy_masked():
    """With -INF masking (center-sampling infeasibility + invalid GT rows)
    the totals must still match and masked-only rows return -1."""
    rng = np.random.RandomState(1)
    for trial in range(10):
        M, R = 8, 40
        q = rng.rand(M, R).astype(np.float32)
        q[rng.rand(M, R) < 0.6] = -INF
        q[5] = -INF  # an entirely-invalid GT row
        dev = np.asarray(device_hungarian(jnp.asarray(q)[None]))[0]
        ref = scipy_max_assignment(q.astype(np.float64))
        assert dev[5] == -1
        assert abs(total_quality(q, dev) - total_quality(q, ref)) < 1e-4
        # both are one-to-one over assigned columns
        used = dev[dev >= 0]
        assert len(used) == len(set(used.tolist()))


def test_device_hungarian_poto_scale_under_jit():
    """POTO-production shape (M=33 padded GTs x R~8.5k shifts) solves under
    jit+vmap and matches scipy."""
    rng = np.random.RandomState(2)
    B, M, R = 2, 33, 8525
    q = (rng.rand(B, M, R) * 0.1).astype(np.float32)
    for b in range(B):
        for m in range(M):
            q[b, m, rng.randint(R)] = 0.5 + 0.4 * rng.rand()
    dev = np.asarray(jax.jit(device_hungarian)(jnp.asarray(q)))
    for b in range(B):
        ref = scipy_max_assignment(q[b].astype(np.float64))
        assert abs(total_quality(q[b], dev[b])
                   - total_quality(q[b], ref)) < 1e-3


def test_linear_sum_assignment_square_identity():
    cost = jnp.asarray(1.0 - np.eye(4, dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(linear_sum_assignment(cost)),
                                  [0, 1, 2, 3])


def test_hungarian_beats_greedy_on_adversarial_matrix():
    # classic case where greedy is suboptimal
    q = jnp.array([[[0.9, 0.85, -INF],
                    [0.89, -INF, -INF]]])
    g = greedy_one_to_one(q[0])
    h = device_hungarian(q)
    # greedy: gt0 -> col0 (0.9), gt1 unassignable -> -1
    np.testing.assert_array_equal(np.asarray(g), [0, -1])
    # hungarian: gt0 -> col1, gt1 -> col0 (total 1.74 > 0.9)
    np.testing.assert_array_equal(np.asarray(h[0]), [1, 0])


def test_agreement_on_peaked_quality():
    """On POTO-like quality (each GT sharply peaked on distinct shifts),
    greedy == hungarian == host oracle."""
    rng = np.random.RandomState(0)
    B, M, R = 2, 6, 64
    q = rng.rand(B, M, R).astype(np.float32) * 0.1
    for b in range(B):
        for m in range(M):
            q[b, m, m * 9 + 3] = 0.9 + 0.01 * m  # distinct peaks
    q = jnp.asarray(q)
    g = jax.lax.map(greedy_one_to_one, q)
    h = device_hungarian(q)
    hh = hungarian_host_one_to_one(q)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(h))
    np.testing.assert_array_equal(np.asarray(hh), np.asarray(h))


def test_masked_rows_unassigned_both():
    q = jnp.full((1, 3, 8), -INF)
    g = jax.lax.map(greedy_one_to_one, q)
    h = device_hungarian(q)
    np.testing.assert_array_equal(np.asarray(g), -1)
    np.testing.assert_array_equal(np.asarray(h), -1)


def test_default_assignment_is_hungarian():
    """The config default must match the reference's exact scipy matching
    (poto.py:359) — via the ON-DEVICE solver: the axon TPU PJRT plugin
    rejects pure_callback (UNIMPLEMENTED host send/recv), so the host path
    exists only as a CPU oracle ('hungarian_host')."""
    from lgd_tpu.config import get_cfg

    assert get_cfg().MODEL.POTO.ASSIGNMENT == "hungarian"


def test_greedy_vs_hungarian_disagreement_measured_on_crowds():
    """Quantifies the greedy approximation on crowded scenes (many
    same-class overlapping GTs -> correlated quality rows). Greedy must
    stay near-optimal in total quality and mostly agree per-GT; the numbers
    here are the measured bound we cite in the docs."""
    rng = np.random.RandomState(0)
    B, M, R = 8, 12, 128
    total_gap = []
    per_gt_disagree = []
    for b in range(B):
        # crowd: GT quality rows share peaks (overlapping objects compete
        # for the same shifts) + noise
        base = rng.rand(R) * 0.5
        q = np.stack([
            base * (0.6 + 0.4 * rng.rand()) + rng.rand(R) * 0.3
            for _ in range(M)
        ]).astype(np.float32)
        g = np.asarray(greedy_one_to_one(jnp.asarray(q)))
        h = np.asarray(device_hungarian(jnp.asarray(q)[None]))[0]
        gq = total_quality(q, g)
        hq = total_quality(q, h)
        assert hq >= gq - 1e-5  # hungarian is the optimum
        # and the device optimum equals the scipy optimum
        sq = total_quality(q, scipy_max_assignment(q.astype(np.float64)))
        assert abs(hq - sq) < 1e-4
        total_gap.append((hq - gq) / max(hq, 1e-9))
        per_gt_disagree.append(np.mean(g != h))
    # measured on this construction: greedy loses <2% total quality and
    # the per-GT assignment disagreement stays below 60% even under heavy
    # crowding -- which is why it is offered as an opt-in, not the default
    assert np.mean(total_gap) < 0.02, np.mean(total_gap)
    assert np.max(total_gap) < 0.05, np.max(total_gap)
    print(f"greedy-vs-hungarian: mean quality gap {np.mean(total_gap):.4f}, "
          f"mean per-GT disagreement {np.mean(per_gt_disagree):.3f}")


def test_hungarian_under_jit():
    q = jnp.asarray(np.random.RandomState(1).rand(2, 4, 16).astype(np.float32))
    h = jax.jit(device_hungarian)(q)
    assert h.shape == (2, 4)
    assert bool((h >= 0).all())
