"""Fused multi-head attention kernel (Pallas TPU) with key-validity masking.

TPU-native equivalent of the cuBLAS/cuDNN ``nn.MultiheadAttention`` the
reference uses for the teacher's inter-object relation adaptation
(dynamic_teacher.py:78,270; SURVEY.md §2.3 "fused Pallas attention" target).
The reference's (T, T) block-diagonal cross-image mask becomes, in the
padded-batch layout, a per-image key-validity mask — the fused kernel
computes softmax(QK^T * scale + mask) V for one (batch, head) pair per grid
step entirely in VMEM: one HBM read per operand, no materialized (N, N)
attention matrix in HBM.

Public entry ``masked_attention`` dispatches to the Pallas kernel on TPU and
to a pure-jnp reference elsewhere (CPU tests, interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def masked_attention_reference(q, k, v, key_valid, scale: float):
    """Pure-jnp reference. q: (B, H, Nq, D); k/v: (B, H, Nk, D);
    key_valid: (B, Nk) bool."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(key_valid[:, None, None, :], logits, -1e9)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, valid_ref, o_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)          # (Nq, D)
    k = k_ref[0].astype(jnp.float32)          # (Nk, D)
    v = v_ref[0].astype(jnp.float32)
    valid = valid_ref[0]                      # (1, Nk) float 0/1

    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    logits = logits + (valid - 1.0) * 1e9     # -1e9 on invalid keys
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    attn = p / jnp.maximum(denom, 1e-30)
    o_ref[0] = jnp.dot(attn, v,
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def masked_attention_pallas(q, k, v, key_valid, scale: float):
    """Pallas fused forward with a recompute backward (custom_vjp): the
    forward never materializes the (N, N) attention matrix in HBM; the
    backward re-derives it via jax.vjp of the jnp reference (cheap at LGD
    teacher sizes, exact)."""
    return _masked_attention_pallas_impl(q, k, v, key_valid, scale)


def _attn_fwd(q, k, v, key_valid, scale):
    out = _masked_attention_pallas_impl(q, k, v, key_valid, scale)
    return out, (q, k, v, key_valid)


def _attn_bwd(scale, res, g):
    q, k, v, key_valid = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: masked_attention_reference(q_, k_, v_, key_valid,
                                                      scale), q, k, v)
    dq, dk, dv = vjp(g)
    import numpy as np

    dvalid = np.zeros(key_valid.shape, jax.dtypes.float0)
    return dq, dk, dv, dvalid


masked_attention_pallas.defvjp(_attn_fwd, _attn_bwd)


@functools.partial(jax.jit, static_argnames=("scale",))
def _masked_attention_pallas_impl(q, k, v, key_valid, scale: float):
    """Pallas kernel: grid over (B*H); each step holds one head's Q/K/V in
    VMEM. Sized for the LGD teacher (N <= a few hundred tokens)."""
    B, H, Nq, D = q.shape
    Nk = k.shape[2]

    qf = q.reshape(B * H, Nq, D)
    kf = k.reshape(B * H, Nk, D)
    vf = v.reshape(B * H, Nk, D)
    validf = jnp.repeat(
        key_valid.astype(jnp.float32)[:, None, :], H, axis=1
    ).reshape(B * H, 1, Nk)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, Nq, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Nq, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Nq, D), q.dtype),
    )(qf, kf, vf, validf)
    return out.reshape(B, H, Nq, D)


_FORCED_IMPL = None  # None = auto; 'pallas' | 'reference'


def set_attention_impl(impl):
    """Force the attention implementation ('pallas'/'reference'/None=auto).
    Needed when the computation targets a device class different from the
    process default backend (e.g. CPU-mesh dry-runs in a TPU process)."""
    global _FORCED_IMPL
    assert impl in (None, "pallas", "reference"), impl
    _FORCED_IMPL = impl


@functools.lru_cache(None)
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform.lower() in ("tpu", "axon")
    except Exception:
        return False


def masked_attention(q, k, v, key_valid, scale: float):
    """Dispatch: Pallas on TPU backends, jnp reference elsewhere (the choice
    is trace-time static — backend is a process-level property; use
    set_attention_impl to override)."""
    if _FORCED_IMPL == "pallas" or (_FORCED_IMPL is None and _on_tpu()):
        return masked_attention_pallas(q, k, v, key_valid, scale)
    return masked_attention_reference(q, k, v, key_valid, scale)
