"""Fused multi-head attention (Pallas TPU) with key-validity masking.

TPU-native equivalent of the cuBLAS/cuDNN ``nn.MultiheadAttention`` the
reference uses for the teacher's inter-object relation adaptation
(dynamic_teacher.py:78,270; SURVEY.md §2.3 "fused Pallas attention" target).
The reference's (T, T) block-diagonal cross-image mask becomes, in the
padded-batch layout, a per-image key-validity mask.

Both directions are fused: the forward kernel computes
``softmax(QK^T * scale + mask) V`` for one (batch, head) pair per grid step
entirely in VMEM, and the backward kernel recomputes the probabilities in
VMEM and emits dQ/dK/dV in a single pass — the (N, N) attention matrix
never exists in HBM in either direction (flash-attention structure; at LGD
teacher sizes one head's full (N, N) tile fits VMEM, so no K/V tiling loop
is needed).

Implementation choice is an explicit argument (``impl``): 'pallas',
'reference' (pure jnp — CPU tests / CPU-mesh dry-runs), or 'auto' (pallas
iff the process backend is a TPU). Config surface: ``cfg.TPU.ATTENTION_IMPL``
threads it through the model tree — no process-global mutable state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def masked_attention_reference(q, k, v, key_valid, scale: float):
    """Pure-jnp reference. q: (B, H, Nq, D); k/v: (B, H, Nk, D);
    key_valid: (B, Nk) bool."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(key_valid[:, None, None, :], logits, -1e9)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _softmax_fp32(q, k, valid, scale):
    """Shared (Nq, Nk) masked softmax used by both kernels (fp32, VMEM)."""
    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    logits = logits + (valid - 1.0) * 1e9     # -1e9 on invalid keys
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    return p / jnp.maximum(denom, 1e-30)


def _attn_kernel(q_ref, k_ref, v_ref, valid_ref, o_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)          # (Nq, D)
    k = k_ref[0].astype(jnp.float32)          # (Nk, D)
    v = v_ref[0].astype(jnp.float32)
    valid = valid_ref[0]                      # (1, Nk) float 0/1
    attn = _softmax_fp32(q, k, valid, scale)
    o_ref[0] = jnp.dot(attn, v,
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, valid_ref, g_ref,
                     dq_ref, dk_ref, dv_ref, *, scale):
    """One (batch*head) pair per grid step: recompute P in VMEM, then
    dV = P^T g;  dP = g V^T;  dS = P * (dP - rowsum(P*dP));
    dQ = dS K * scale;  dK = dS^T Q * scale."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    valid = valid_ref[0]
    g = g_ref[0].astype(jnp.float32)          # (Nq, D)

    p = _softmax_fp32(q, k, valid, scale)     # (Nq, Nk)
    dv = jnp.dot(p.T, g, preferred_element_type=jnp.float32)
    dp = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
    row = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - row)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jnp.dot(ds.T, q, preferred_element_type=jnp.float32) * scale

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flatten_heads(q, k, v, key_valid):
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    qf = q.reshape(B * H, Nq, D)
    kf = k.reshape(B * H, Nk, D)
    vf = v.reshape(B * H, Nk, D)
    validf = jnp.repeat(
        key_valid.astype(jnp.float32)[:, None, :], H, axis=1
    ).reshape(B * H, 1, Nk)
    return qf, kf, vf, validf


def _vspec(block):
    return pl.BlockSpec(block, lambda i: (i,) + (0,) * (len(block) - 1),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def masked_attention_pallas(q, k, v, key_valid, scale: float):
    """Fused Pallas forward + fused Pallas backward (custom_vjp): neither
    direction materializes the (N, N) attention matrix in HBM."""
    return _pallas_fwd_impl(q, k, v, key_valid, scale)


@functools.partial(jax.jit, static_argnames=("scale",))
def _pallas_fwd_impl(q, k, v, key_valid, scale: float):
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    qf, kf, vf, validf = _flatten_heads(q, k, v, key_valid)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(B * H,),
        in_specs=[_vspec((1, Nq, D)), _vspec((1, Nk, D)),
                  _vspec((1, Nk, D)), _vspec((1, 1, Nk))],
        out_specs=_vspec((1, Nq, D)),
        out_shape=jax.ShapeDtypeStruct((B * H, Nq, D), q.dtype),
    )(qf, kf, vf, validf)
    return out.reshape(B, H, Nq, D)


@functools.partial(jax.jit, static_argnames=("scale",))
def _pallas_bwd_impl(q, k, v, key_valid, g, scale: float):
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    qf, kf, vf, validf = _flatten_heads(q, k, v, key_valid)
    gf = g.reshape(B * H, Nq, D)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        grid=(B * H,),
        in_specs=[_vspec((1, Nq, D)), _vspec((1, Nk, D)),
                  _vspec((1, Nk, D)), _vspec((1, 1, Nk)),
                  _vspec((1, Nq, D))],
        out_specs=[_vspec((1, Nq, D)), _vspec((1, Nk, D)),
                   _vspec((1, Nk, D))],
        out_shape=[jax.ShapeDtypeStruct((B * H, Nq, D), q.dtype),
                   jax.ShapeDtypeStruct((B * H, Nk, D), k.dtype),
                   jax.ShapeDtypeStruct((B * H, Nk, D), v.dtype)],
    )(qf, kf, vf, validf, gf)
    return (dq.reshape(B, H, Nq, D), dk.reshape(B, H, Nk, D),
            dv.reshape(B, H, Nk, D))


def _attn_fwd(q, k, v, key_valid, scale):
    out = _pallas_fwd_impl(q, k, v, key_valid, scale)
    return out, (q, k, v, key_valid)


def _attn_bwd(scale, res, g):
    q, k, v, key_valid = res
    dq, dk, dv = _pallas_bwd_impl(q, k, v, key_valid, g, scale)
    dvalid = np.zeros(key_valid.shape, jax.dtypes.float0)
    return dq, dk, dv, dvalid


masked_attention_pallas.defvjp(_attn_fwd, _attn_bwd)


@functools.lru_cache(None)
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform.lower() in ("tpu", "axon")
    except Exception:
        return False


# below this sequence length the fused kernel's per-(batch, head) grid
# launch costs more than it saves: the whole (N, N) problem fits VMEM-side
# fusions XLA already does. Measured at the LGD teacher's shapes
# (B16, H8, N33, D32, f32, fwd+bwd on v5e): pallas 2.23 ms vs einsum
# 1.57 ms; the kernel wins (and bounds HBM) for long instance sets.
_PALLAS_MIN_SEQ = 128


def masked_attention(q, k, v, key_valid, scale: float, impl: str = "auto"):
    """impl: 'pallas' | 'reference' | 'auto'. 'auto' picks the fused Pallas
    kernel iff the process backend is TPU AND the key/query sets are long
    enough for the kernel to beat XLA's fused einsums (trace-time static
    shape test — see _PALLAS_MIN_SEQ). Thread the choice explicitly
    (cfg.TPU.ATTENTION_IMPL) when the computation targets a device class
    other than the process default (e.g. CPU-mesh dry-runs in a TPU
    process)."""
    if impl not in ("auto", "pallas", "reference"):
        raise ValueError(f"unknown attention impl {impl!r}")
    big = max(q.shape[-2], k.shape[-2]) >= _PALLAS_MIN_SEQ
    if impl == "pallas" or (impl == "auto" and big and _on_tpu()):
        return masked_attention_pallas(q, k, v, key_valid, scale)
    return masked_attention_reference(q, k, v, key_valid, scale)
