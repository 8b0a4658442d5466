"""Shape-static greedy NMS for TPU.

TPU-native replacement for torchvision's ``nms.cu`` / cvpods
``generalized_batched_nms`` (reference use: thirdparty_heads/fcos.py:384-388
and detectron2 RetinaNet/RPN/ROI inference; SURVEY.md §2.3). Candidates are
fixed-capacity padded arrays with validity masks.

Greedy NMS is the unique fixpoint of ``keep[i] = valid[i] AND no kept
earlier j with IoU(j, i) > thr`` (induction over score rank). Instead of the
O(N) *sequential* sweep (a 2000-step ``fori_loop`` of tiny vector ops is
latency-bound on TPU: measured 25 ms for batch 8 x 2000 candidates), we
iterate that recurrence as a dense suppressor-count matvec on the MXU until
it stabilizes. Each iteration pins at least one more level of the
suppression DAG, so the loop converges to the exact greedy result in
(dag-depth + 1) iterations — single digits for real detections — and the
equality test only passes at a true fixpoint, so early exit is sound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..structures import boxes as box_ops

NEG_INF = -1e10


def _on_tpu_backend() -> bool:
    try:
        return jax.devices()[0].platform.lower() in ("tpu", "axon")
    except Exception:  # noqa: BLE001 - no backend at all
        return False


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


@functools.lru_cache(maxsize=16)
def _sweep_kernel(Np: int, interpret: bool):
    """O(N) greedy sweep with the suppressor matrix resident in VMEM.

    The fixpoint-matvec loop re-reads the (N, N) suppressor from HBM every
    iteration and converges in DAG-depth iterations — profiled at 17-19 ms
    per call in the R-CNN train step on dense RPN box soups (hundreds of
    levels). Here the classic sequential greedy sweep runs entirely in
    VMEM: row i of ``sup`` suppresses later rows iff row i is kept, so one
    pass over rows (16-row blocks, static-unrolled inner loop) produces the
    exact same keep set with zero per-iteration HBM traffic.

    Kernel signature (unbatched; jax.vmap adds the batch grid dimension):
    sup (Np, Np) bf16 upper-triangular, valid (1, Np) f32 -> keep (1, Np) f32.
    """

    def kernel(sup_ref, valid_ref, keep_ref):
        valid = valid_ref[0:1, :]                     # (1, Np) f32
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)

        def block(g, suppressed):
            rows = sup_ref[pl.ds(g * 16, 16), :].astype(jnp.float32)
            for r in range(16):
                i = g * 16 + r
                onehot = (lane == i).astype(jnp.float32)
                # invalid rows start suppressed (see init), so one
                # reduction decides keep: kept iff not yet suppressed
                s_i = jnp.sum(suppressed * onehot)
                k_i = jnp.where(s_i < 0.5, 1.0, 0.0)
                suppressed = jnp.maximum(suppressed, k_i * rows[r:r + 1, :])
            return suppressed

        # fold validity into the initial state: invalid rows are born
        # suppressed — they never suppress anyone and end up not kept
        suppressed = jax.lax.fori_loop(
            0, Np // 16, block, 1.0 - valid)
        keep_ref[0:1, :] = (suppressed < 0.5).astype(jnp.float32)

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Np), jnp.float32),
        interpret=interpret,
    )


def _greedy_keep(sup, valid_s, n_bound: int, impl: str = "auto"):
    """Greedy keep set for a score-sorted upper-triangular suppressor.

    impl: 'auto' (Pallas sweep on TPU, fixpoint matvec elsewhere),
    'pallas' (force, interpret off-TPU — for parity tests), 'fixpoint'.
    """
    if impl == "auto":
        impl = "pallas" if _on_tpu_backend() else "fixpoint"
    if impl == "fixpoint":
        return _fixpoint_keep(sup, valid_s, n_bound)
    n = sup.shape[-1]
    Np = max(_round_up(n, 128), 128)
    sup_p = jnp.pad(sup.astype(jnp.bfloat16), ((0, Np - n), (0, Np - n)))
    valid_p = jnp.pad(valid_s.astype(jnp.float32), (0, Np - n)).reshape(1, Np)
    keep = _sweep_kernel(Np, not _on_tpu_backend())(sup_p, valid_p)
    return keep[0, :n] > 0.5


def _fixpoint_keep(sup, valid_s, n_bound: int):
    """Iterate keep[i] = valid[i] AND (no kept j<i with sup[j,i]) to its
    unique fixpoint (== greedy NMS restricted to this suppressor matrix)."""

    def cond(carry):
        keep, prev, it = carry
        return (it < n_bound) & jnp.any(keep != prev)

    def body(carry):
        keep, _, it = carry
        cnt = jnp.matmul(keep.astype(jnp.bfloat16), sup,
                         preferred_element_type=jnp.float32)
        return valid_s & (cnt < 0.5), keep, it + 1

    keep_s, _, _ = jax.lax.while_loop(
        cond, body, (valid_s, ~valid_s, jnp.int32(0)))
    return keep_s


def nms_mask(boxes, scores, valid, iou_threshold: float, tile: int = 2048,
             impl: str = "auto"):
    """Exact greedy NMS.

    Args:
        boxes: (N, 4); scores: (N,); valid: (N,) bool.
    Returns:
        keep: (N,) bool — suppressed/invalid entries are False. Candidates
        are processed in score order (identical result to sorting first).

    For N <= tile, one (N, N) suppressor matrix + fixpoint matvecs. For
    larger N (RPN training pools concatenate ~2k proposals x 5 levels:
    a full (N, N) IoU is ~290 MB/image and every fixpoint iteration
    re-reads it — measured ~17 ms per NMS call in the R-CNN train step),
    process score-sorted tiles sequentially: the keep decision for every
    earlier tile is final, so each tile needs one (T, N) IoU block (vs
    the finalized prefix) plus a (T, T) within-tile fixpoint. Identical
    output, O(tile) x less resident suppressor state.
    """
    n = boxes.shape[0]
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores)
    boxes_s = boxes[order]
    valid_s = masked_scores[order] > NEG_INF

    if n <= tile:
        iou = box_ops.pairwise_iou(boxes_s, boxes_s)  # (N, N)
        idx = jnp.arange(n)
        # sup[j, i] = 1 iff j (earlier in score order) suppresses i when
        # kept. bf16 operand: the matvec only distinguishes count==0 from
        # count>0, and a sum of nonnegative values cannot round to 0
        # unless all are 0.
        sup = ((iou > iou_threshold)
               & (idx[:, None] < idx[None, :])).astype(jnp.bfloat16)
        keep_s = _greedy_keep(sup, valid_s, n, impl)
    else:
        n_tiles = -(-n // tile)
        pad = n_tiles * tile - n
        boxes_p = jnp.pad(boxes_s, ((0, pad), (0, 0)))
        valid_p = jnp.pad(valid_s, (0, pad))
        idx_n = jnp.arange(n_tiles * tile)
        t_idx = jnp.arange(tile)

        def body(t, keep):
            start = t * tile
            tb = jax.lax.dynamic_slice(boxes_p, (start, 0), (tile, 4))
            iou_tn = box_ops.pairwise_iou(tb, boxes_p)  # (T, N')
            # suppressed by a FINAL kept candidate in an earlier tile
            ext = jnp.any((iou_tn > iou_threshold)
                          & (idx_n[None, :] < start) & keep[None, :], axis=1)
            iou_tt = jax.lax.dynamic_slice(iou_tn, (0, start), (tile, tile))
            sup_tt = ((iou_tt > iou_threshold)
                      & (t_idx[:, None] < t_idx[None, :])).astype(
                          jnp.bfloat16)
            tv = jax.lax.dynamic_slice(valid_p, (start,), (tile,)) & ~ext
            keep_t = _greedy_keep(sup_tt, tv, tile, impl)
            return jax.lax.dynamic_update_slice(keep, keep_t, (start,))

        keep_s = jax.lax.fori_loop(
            0, n_tiles, body, jnp.zeros((n_tiles * tile,), bool))[:n]

    # scatter back to original order
    keep = jnp.zeros((n,), bool).at[order].set(keep_s)
    return keep


def batched_nms_mask(boxes, scores, classes, valid, iou_threshold: float,
                     impl: str = "auto"):
    """Class-aware NMS via the coordinate-offset trick (detectron2
    ``batched_nms`` / cvpods ``generalized_batched_nms`` nms_type='normal')."""
    max_coord = jnp.max(jnp.where(valid[..., None], boxes, 0.0)) + 1.0
    offsets = classes.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[..., None]
    return nms_mask(shifted, scores, valid, iou_threshold, impl=impl)


def topk_detections(boxes, scores, classes, keep, k: int):
    """Select top-k kept detections into fixed-size padded outputs.

    Returns (boxes (k,4), scores (k,), classes (k,), valid (k,))."""
    masked = jnp.where(keep, scores, NEG_INF)
    top_scores, idx = jax.lax.top_k(masked, k)
    out_valid = top_scores > NEG_INF
    return boxes[idx], jnp.where(out_valid, top_scores, 0.0), classes[idx], out_valid
