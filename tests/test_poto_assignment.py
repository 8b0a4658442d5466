"""POTO assignment: greedy-vs-Hungarian agreement on typical quality
surfaces and the exact-optimality property of the Hungarian path."""

import jax
import jax.numpy as jnp
import numpy as np

from lgd_tpu.models.heads.poto import (
    INF,
    greedy_one_to_one,
    hungarian_one_to_one,
)


def test_hungarian_beats_greedy_on_adversarial_matrix():
    # classic case where greedy is suboptimal
    q = jnp.array([[[0.9, 0.85, -INF],
                    [0.89, -INF, -INF]]])
    g = greedy_one_to_one(q[0])
    h = hungarian_one_to_one(q)
    # greedy: gt0 -> col0 (0.9), gt1 unassignable -> -1
    np.testing.assert_array_equal(np.asarray(g), [0, -1])
    # hungarian: gt0 -> col1, gt1 -> col0 (total 1.74 > 0.9)
    np.testing.assert_array_equal(np.asarray(h[0]), [1, 0])


def test_agreement_on_peaked_quality():
    """On POTO-like quality (each GT sharply peaked on distinct shifts),
    greedy == hungarian."""
    rng = np.random.RandomState(0)
    B, M, R = 2, 6, 64
    q = rng.rand(B, M, R).astype(np.float32) * 0.1
    for b in range(B):
        for m in range(M):
            q[b, m, m * 9 + 3] = 0.9 + 0.01 * m  # distinct peaks
    q = jnp.asarray(q)
    g = jax.lax.map(greedy_one_to_one, q)
    h = hungarian_one_to_one(q)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(h))


def test_masked_rows_unassigned_both():
    q = jnp.full((1, 3, 8), -INF)
    g = jax.lax.map(greedy_one_to_one, q)
    h = hungarian_one_to_one(q)
    np.testing.assert_array_equal(np.asarray(g), -1)
    np.testing.assert_array_equal(np.asarray(h), -1)


def test_hungarian_under_jit():
    q = jnp.asarray(np.random.RandomState(1).rand(2, 4, 16).astype(np.float32))
    h = jax.jit(hungarian_one_to_one)(q)
    assert h.shape == (2, 4)
    assert bool((h >= 0).all())
