"""Exact linear-sum assignment (Hungarian / Jonker-Volgenant) on device.

TPU-native replacement for the reference POTO's scipy
``linear_sum_assignment`` host call (reference
models/customized_detectors/thirdparty_heads/poto.py:335-359): the shortest
augmenting path formulation with dual potentials, expressed as two nested
``lax.while_loop``s over fixed-shape (R,) vectors so the whole matcher jits,
shards, and vmaps. A host ``pure_callback`` is NOT an option on this
hardware path — the axon PJRT plugin rejects host send/recv callbacks
outright (measured: ``UNIMPLEMENTED: axon_pjrt does not support host
send/recv callbacks``), and even where supported it forces a device->host
sync every step.

Cost model: POTO matches M = max_instances (<= ~33) GT rows against
R ~ 10^4 shift columns. Each augmentation's Dijkstra scans at most M+1
columns before reaching an unmatched one (every scanned column except the
last is matched, and at most M columns are ever matched), so the total work
is M * (M+1) sequential steps of O(R) vector arithmetic — ~10^3 lockstep
steps on (B, R) lanes under vmap. Exactness: standard LAP duality; the
result attains the same optimal total as scipy (ties may pick a different
optimal permutation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(jnp.inf)


def linear_sum_assignment(cost: jax.Array) -> jax.Array:
    """Minimize ``sum(cost[i, col4row[i]])`` over one-to-one assignments.

    cost: (M, R) float32 with M <= R; entries must be finite (mask with a
    large finite penalty, not inf/nan). Returns col4row (M,) int32 — every
    row is assigned a distinct column (the caller filters penalty matches).
    """
    M, R = cost.shape
    if M > R:
        raise ValueError(f"need M <= R, got {cost.shape}")
    cost = cost.astype(jnp.float32)

    def augment(cur_row, carry):
        u, v, row4col, col4row = carry

        # --- Dijkstra from cur_row over columns (reduced costs) ---------
        def dijkstra_cond(s):
            _, _, _, _, _, sink, _ = s
            return sink < 0

        def dijkstra_body(s):
            sp, path, sc, sr, i, _, minval = s
            sr = sr.at[i].set(True)
            red = minval + cost[i] - u[i] - v  # (R,)
            better = (red < sp) & ~sc
            path = jnp.where(better, i, path)
            sp = jnp.where(better, red, sp)
            d = jnp.where(sc, _INF, sp)
            j = jnp.argmin(d)
            minval = d[j]
            sc = sc.at[j].set(True)
            nxt = row4col[j]
            sink = jnp.where(nxt < 0, j, -1)
            return sp, path, sc, sr, nxt, sink, minval

        sp0 = jnp.full((R,), _INF)
        path0 = jnp.full((R,), -1, jnp.int32)
        sc0 = jnp.zeros((R,), bool)
        sr0 = jnp.zeros((M,), bool)
        sp, path, sc, sr, _, sink, minval = jax.lax.while_loop(
            dijkstra_cond, dijkstra_body,
            (sp0, path0, sc0, sr0, cur_row, jnp.int32(-1), jnp.float32(0.0)))

        # --- dual update (scipy _lsap.c semantics) -----------------------
        u = u.at[cur_row].add(minval)
        sp_at_match = sp[jnp.where(col4row >= 0, col4row, 0)]
        other = sr & (jnp.arange(M) != cur_row)
        u = u + jnp.where(other, minval - sp_at_match, 0.0)
        v = v + jnp.where(sc, sp - minval, 0.0)

        # --- augment along the alternating path --------------------------
        def aug_cond(s):
            _, _, _, done = s
            return ~done

        def aug_body(s):
            row4col, col4row, j, _ = s
            i = path[j]
            row4col = row4col.at[j].set(i)
            nxt = col4row[i]
            col4row = col4row.at[i].set(j)
            return row4col, col4row, nxt, i == cur_row

        row4col, col4row, _, _ = jax.lax.while_loop(
            aug_cond, aug_body, (row4col, col4row, sink, jnp.bool_(False)))
        return u, v, row4col, col4row

    u0 = jnp.zeros((M,))
    v0 = jnp.zeros((R,))
    row4col0 = jnp.full((R,), -1, jnp.int32)
    col4row0 = jnp.full((M,), -1, jnp.int32)
    _, _, _, col4row = jax.lax.fori_loop(
        0, M, augment, (u0, v0, row4col0, col4row0))
    return col4row


def max_quality_assignment(quality: jax.Array,
                           penalty: float = -1e8) -> jax.Array:
    """Maximize total quality one-to-one. quality: (M, R) with masked
    entries <= ``penalty``. Returns (M,) int32 column per row, -1 where the
    row only reached masked entries (matches the host scipy wrapper's
    ``keep = q > -INF/2`` filter).

    Masked entries are re-clamped to a data-scaled finite penalty before
    solving: in f32, duals carrying a raw 1e8 penalty swamp O(1) quality
    differences (ulp(1e8) = 8 — measured suboptimal totals vs scipy/f64).
    Any equal per-edge penalty > the largest possible feasible-total gap
    (2*M*span) yields scipy's exact objective order: minimize the number of
    masked edges first, then maximize the feasible sum.
    """
    M = quality.shape[0]
    quality = quality.astype(jnp.float32)
    feasible = quality > penalty / 2
    span = jnp.max(jnp.where(feasible, jnp.abs(quality), 0.0)) + 1.0
    big = (2.0 * M + 2.0) * span
    cost = jnp.where(feasible, -quality, big)
    col4row = linear_sum_assignment(cost)
    q = jnp.take_along_axis(quality, col4row[:, None].clip(0), axis=1)[:, 0]
    return jnp.where(q > penalty / 2, col4row, -1).astype(jnp.int32)
