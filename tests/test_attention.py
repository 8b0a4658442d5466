"""Fused attention kernel: Pallas (interpret mode on CPU) vs jnp reference,
and torch nn.MultiheadAttention parity of the module wrapper."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import torch

from lgd_tpu.ops.attention import (
    _attn_kernel,
    masked_attention_reference,
)


def _pallas_interpret(q, k, v, key_valid, scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    qf = q.reshape(B * H, Nq, D)
    kf = k.reshape(B * H, Nk, D)
    vf = v.reshape(B * H, Nk, D)
    validf = jnp.repeat(key_valid.astype(jnp.float32)[:, None, :], H,
                        axis=1).reshape(B * H, 1, Nk)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, Nq, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Nk, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Nk, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, Nk), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Nq, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Nq, D), q.dtype),
        interpret=True,
    )(qf, kf, vf, validf)
    return out.reshape(B, H, Nq, D)


def test_pallas_kernel_matches_reference():
    rng = np.random.RandomState(0)
    B, H, N, D = 2, 4, 24, 16
    q = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, N) > 0.3)
    valid = valid.at[:, 0].set(True)  # at least one key per image
    scale = 1.0 / D ** 0.5
    ref = masked_attention_reference(q, k, v, valid, scale)
    out = _pallas_interpret(q, k, v, valid, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_backward_kernel_matches_reference_grads():
    """The fused dQ/dK/dV backward kernel (interpret mode) must match
    jax.grad of the jnp reference — training never materializes (N, N) in
    HBM (VERDICT r1 #5)."""
    from lgd_tpu.ops.attention import _pallas_bwd_impl

    rng = np.random.RandomState(2)
    B, H, N, D = 2, 3, 16, 8
    q = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, N) > 0.3)
    valid = valid.at[:, 0].set(True)
    g = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
    scale = 1.0 / D ** 0.5

    def loss(q_, k_, v_):
        out = masked_attention_reference(q_, k_, v_, valid, scale)
        return jnp.vdot(out, g)

    want_dq, want_dk, want_dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    with jax.disable_jit():  # interpret pallas on CPU
        import unittest.mock as mock
        from jax.experimental import pallas as pl

        orig = pl.pallas_call

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        with mock.patch.object(pl, "pallas_call", interp):
            dq, dk, dv = _pallas_bwd_impl(q, k, v, valid, g, scale)

    np.testing.assert_allclose(np.asarray(dq), np.asarray(want_dq),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(want_dk),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(want_dv),
                               rtol=1e-4, atol=1e-5)


def test_reference_matches_torch_mha():
    """Batched masked attention == torch nn.MultiheadAttention with a
    block-diagonal mask on the flattened ragged sequence (the reference's
    layout, dynamic_teacher.py:255-270)."""
    rng = np.random.RandomState(1)
    C, H = 32, 4
    n1, n2 = 3, 5  # ragged instance counts of two images
    M = 6          # padded capacity
    x1 = rng.randn(n1, C).astype(np.float32)
    x2 = rng.randn(n2, C).astype(np.float32)
    y1 = rng.randn(n1, C).astype(np.float32)
    y2 = rng.randn(n2, C).astype(np.float32)

    # --- torch: flattened (T, 1, C) with block-diagonal attn_mask
    mha = torch.nn.MultiheadAttention(C, H, bias=False)
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.eye(C).repeat(3, 1))
        mha.out_proj.weight.copy_(torch.eye(C))
    T = n1 + n2
    img_of = torch.tensor([0] * n1 + [1] * n2)
    mask = img_of[:, None] != img_of[None, :]
    q_t = torch.tensor(np.concatenate([x1, x2])).unsqueeze(1)
    kv_t = torch.tensor(np.concatenate([y1, y2])).unsqueeze(1)
    with torch.no_grad():
        out_t, _ = mha(q_t, kv_t, kv_t, attn_mask=mask)
    out_t = out_t.squeeze(1).numpy()

    # --- ours: padded batch + key validity (identity projections)
    def pad(a, n):
        out = np.zeros((M, C), np.float32)
        out[:n] = a
        return out

    q = jnp.asarray(np.stack([pad(x1, n1), pad(x2, n2)]))
    kv = jnp.asarray(np.stack([pad(y1, n1), pad(y2, n2)]))
    valid = jnp.asarray(np.stack([
        np.arange(M) < n1, np.arange(M) < n2]))
    Dh = C // H
    qh = q.reshape(2, M, H, Dh).transpose(0, 2, 1, 3)
    kh = kv.reshape(2, M, H, Dh).transpose(0, 2, 1, 3)
    out = masked_attention_reference(qh, kh, kh, valid, 1.0 / Dh ** 0.5)
    out = out.transpose(0, 2, 1, 3).reshape(2, M, C)

    np.testing.assert_allclose(np.asarray(out[0, :n1]), out_t[:n1],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1, :n2]), out_t[n1:],
                               rtol=1e-4, atol=1e-5)
