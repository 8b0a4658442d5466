"""Fast exact top-k over (anchor, class) score grids.

Detection inference needs the top-k of the flattened (R, K) per-level score
grid (detectron2 RetinaNet.inference topk_candidates; thirdparty_heads/
fcos.py:323-341). ``lax.top_k`` itself is bandwidth-fast on TPU, but
flattening the (B, R, K) tensor first forces a de-padding relayout of the
lane-padded class axis (K=80 pads to 128 lanes) that costs ~60 ms per step
at RetinaNet-R50 scale — 15x the whole sort.

``topk_flat_pairs`` avoids the flatten with an exact decomposition: at most
k distinct anchors can hold entries of the global top-k (pigeonhole), and
every anchor holding one has per-anchor max >= the k-th value, so the top-k
anchors by class-max (a layout-friendly minor-axis reduce + an (B, R) top_k)
are a superset. Gathering those k anchors' K scores (k*K values) and running
one small top_k finishes the job. Ties at the k-th value may resolve to
different (anchor, class) pairs than a flat ``lax.top_k`` (identical values,
tie-broken by flat index there, by anchor-max rank here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_flat_pairs(scores, k: int):
    """Exact top-k over the flattened last two axes of ``scores``.

    Args:
        scores: (B, R, K) — per-anchor per-class scores.
        k: number of entries to select (clamped to R*K).
    Returns:
        (values (B, k'), flat_idx (B, k')) with k' = min(k, R*K); flat_idx
        is ``anchor * K + cls``, matching ``lax.top_k(scores.reshape(B, -1))``.
    """
    B, R, K = scores.shape
    k = min(k, R * K)
    ka = min(k, R)
    if ka == R:
        # every anchor participates; no pre-selection needed
        return jax.lax.top_k(scores.reshape(B, R * K), k)
    amax = jnp.max(scores, axis=2)                       # (B, R)
    _, aidx = jax.lax.top_k(amax, ka)                    # (B, ka)
    sub = jnp.take_along_axis(scores, aidx[..., None], axis=1)  # (B, ka, K)
    v, i2 = jax.lax.top_k(sub.reshape(B, ka * K), k)
    anchor = jnp.take_along_axis(aidx, i2 // K, axis=1)
    return v, anchor * K + (i2 % K)
