"""Track <-> detection assignment inside jit (component G, SURVEY.md §2.3).

Replaces the reference's per-frame host calls (greedy argmin loop /
scipy.optimize.linear_sum_assignment, SURVEY.md §3.3) with static-shape
`lax` loops so the whole tracker lives in the device scan.

Both assigners consume a dense (T, D) float32 cost matrix where invalid
pairs (inactive track / invalid det) carry BIG, and return, for every
detection column j, the matched row index or -1.

- greedy_assign: repeatedly takes the global minimum entry <= max_dist,
  ties broken by smallest row-major flat index — exactly the semantics of
  refimpl.tracker.greedy_assign.
- hungarian_assign: potential-based shortest-augmenting-path Hungarian
  (O(n^3), the classic Jonker-Volgenant-style formulation) on the square
  BIG-padded matrix, then gates pairs with cost > max_dist. On the valid
  submatrix this equals scipy.optimize.linear_sum_assignment: padding with
  a large constant preserves the real-pair optimum because minimizing total
  cost first maximizes the number of sub-BIG matches, then minimizes their
  sum — the same objective as scipy's rectangular LSA.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# np (not jnp): a module-level jnp scalar would initialize the JAX
# backend at import time — `import tpuva.app` must not touch the device
# (and hangs forever if the accelerator is unreachable). np.float32
# converts identically inside traced expressions.
BIG = np.float32(1e30)


@jax.jit
def greedy_assign(cost: jnp.ndarray, max_dist) -> jnp.ndarray:
    """cost: (T, D). Returns (D,) int32: matched row per column, -1 if none.

    Scatter-free: the per-pick row/column elimination and the result
    update are iota-compare selects (elementwise, fuse into one VPU kernel
    per pick) — scatters cost ~10x more per op inside the tracker scan."""
    T, D = cost.shape
    max_dist = jnp.float32(max_dist)
    rowi = lax.broadcasted_iota(jnp.int32, (T, D), 0)
    coli = lax.broadcasted_iota(jnp.int32, (T, D), 1)
    di = jnp.arange(D, dtype=jnp.int32)

    def body(_, state):
        c, row_for_col = state
        flat = jnp.argmin(c.reshape(-1)).astype(jnp.int32)
        v = jnp.min(c)  # value at argmin (ties: argmin = first flat index)
        i, j = flat // D, flat % D
        ok = v <= max_dist
        row_for_col = jnp.where(ok & (di == j), i, row_for_col)
        c = jnp.where(ok & ((rowi == i) | (coli == j)), BIG, c)
        return c, row_for_col

    _, row_for_col = lax.fori_loop(
        0, min(T, D), body, (cost, jnp.full((D,), -1, jnp.int32))
    )
    return row_for_col


def _hungarian_rect(a: jnp.ndarray) -> jnp.ndarray:
    """Exact min-cost matching of ALL rows of an (m, n) matrix, m <= n.

    Returns p: (n+1,) int32 where p[j] (j = 1..n, 1-indexed) is the
    1-indexed row matched to column j (0 = unmatched column). Classic
    potentials formulation (Jonker-Volgenant style): for each new row,
    grow a shortest-path tree over columns (Dijkstra with reduced costs),
    then augment along the recorded `way` pointers.

    Scanning the SMALLER side (m rows, not max(m, n)) halves the outer
    scan for the typical tracks > detections table; all inner updates are
    iota-compare selects, not scatters (~10x cheaper at this size inside
    the per-frame tracker scan).
    """
    m, n = a.shape
    INF = jnp.float32(1e38)
    jcols = jnp.arange(n + 1, dtype=jnp.int32)
    rrows = jnp.arange(m + 1, dtype=jnp.int32)

    def add_row(carry, i):
        u, v, p = carry  # u: (m+1,), v: (n+1,) potentials; p: col -> row
        p = jnp.where(jcols == 0, i, p)

        def tree_cond(s):
            _u, _v, p_, _minv, _way, _used, j0 = s
            return p_[j0] != 0

        def tree_body(s):
            u, v, p_, minv, way, used, j0 = s
            used = used | (jcols == j0)
            i0 = p_[j0]
            cur = a[i0 - 1, :] - u[i0] - v[1:]
            cols_used = used[1:]
            better = (~cols_used) & (cur < minv[1:])
            minv = jnp.where(
                jcols >= 1,
                jnp.where(
                    jnp.pad(better, (1, 0)), jnp.pad(cur, (1, 0)), minv
                ),
                minv,
            )
            way = jnp.where(
                (jcols >= 1) & jnp.pad(better, (1, 0)), j0, way
            )
            mv = jnp.where(cols_used, INF, minv[1:])
            j1 = (jnp.argmin(mv) + 1).astype(jnp.int32)
            delta = mv[j1 - 1]
            # u[p[j]] += delta for used cols j (as a per-row count, no
            # scatter); v[j] -= delta for used; minv[j] -= delta unused
            cnt = jnp.sum(
                jnp.where(
                    used[None, :] & (p_[None, :] == rrows[:, None]), 1.0, 0.0
                ),
                axis=1,
            )
            u = u + delta * cnt
            v = v - jnp.where(used, delta, 0.0)
            minv = minv - jnp.where(used, 0.0, delta)
            return u, v, p_, minv, way, used, j1

        minv0 = jnp.full((n + 1,), INF, jnp.float32)
        way0 = jnp.zeros((n + 1,), jnp.int32)
        used0 = jnp.zeros((n + 1,), bool)
        u, v, p, _minv, way, _used, j0 = lax.while_loop(
            tree_cond, tree_body, (u, v, p, minv0, way0, used0, jnp.int32(0))
        )

        def aug_cond(s):
            _p, j0_ = s
            return j0_ != 0

        def aug_body(s):
            p_, j0_ = s
            j1 = way[j0_]
            p_ = jnp.where(jcols == j0_, p_[j1], p_)
            return p_, j1

        p, _ = lax.while_loop(aug_cond, aug_body, (p, j0))
        return (u, v, p), None

    u0 = jnp.zeros((m + 1,), jnp.float32)
    v0 = jnp.zeros((n + 1,), jnp.float32)
    p0 = jnp.zeros((n + 1,), jnp.int32)
    (_, _, p), _ = lax.scan(
        add_row, (u0, v0, p0), jnp.arange(1, m + 1, dtype=jnp.int32)
    )
    return p


def _hungarian_slow(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact LSA row-for-column on (T, D) with BIG invalids — the general
    path behind the fast gate. Orients the JV scan along the smaller side."""
    T, D = cost.shape
    n = max(T, D)
    # Replace BIG invalid entries with an adaptive finite CAP:
    # CAP > (n+1) * max_valid_cost guarantees "maximize real matches, then
    # minimize their sum" (scipy's rectangular behavior), while keeping the
    # dual potentials small enough that float32 reduced costs retain
    # precision (1e30 padding would annihilate real cost differences).
    valid = cost < BIG / 2
    maxv = jnp.max(jnp.where(valid, cost, 0.0))
    cap = maxv * (n + 1) + 1.0
    c = jnp.where(valid, cost, cap)
    if T <= D:
        p = _hungarian_rect(c)  # (D+1,) col -> row
        return p[1:D + 1] - 1
    # transpose: scan D detection-rows over T track-columns, then invert
    p = _hungarian_rect(c.T)  # (T+1,) track-col -> det-row (1-indexed)
    det_for_track = p[1:T + 1] - 1  # (T,) 0-indexed det or -1
    tr = jnp.arange(T, dtype=jnp.int32)
    eq = (det_for_track[None, :] == jnp.arange(D)[:, None]) & (
        det_for_track[None, :] >= 0
    )  # (D, T)
    has = jnp.any(eq, axis=1)
    row = jnp.argmax(eq, axis=1).astype(jnp.int32)
    del tr
    return jnp.where(has, row, -1)


@jax.jit
def hungarian_assign(cost: jnp.ndarray, max_dist) -> jnp.ndarray:
    """cost: (T, D) with BIG at invalid pairs. Returns (D,) int32
    row-for-column (-1 where unmatched or gated by max_dist).

    Fast path (the overwhelmingly common tracking frame): consider the
    VALID columns (column minimum < BIG — i.e. real detections with at
    least one pairable track). If every valid column's minimum is STRICT,
    their argmin rows are pairwise DISTINCT, and there are at most T of
    them, then in EVERY optimum each valid column takes exactly its
    argmin row (any deviation pays strictly more on that column and
    nothing can compensate: all other columns are already at their
    minima, and all-BIG columns cost BIG wherever they match). Invalid
    columns' matches differ among optima but are erased by the max_dist
    gate — exactly as scipy's would be. So the gated fast answer equals
    the gated scipy answer, and the O(n^3) search is skipped via
    lax.cond. Contested or degenerate frames fall through to the exact
    JV."""
    T, D = cost.shape
    colmin = jnp.min(cost, axis=0)  # (D,)
    amin = jnp.argmin(cost, axis=0).astype(jnp.int32)  # (D,)
    validc = colmin < BIG / 2
    strict = jnp.sum((cost == colmin[None, :]).astype(jnp.int32), axis=0) == 1
    same = (
        (amin[:, None] == amin[None, :]) & validc[:, None] & validc[None, :]
    )
    distinct = jnp.sum(same.astype(jnp.int32), axis=1) == 1
    fast_ok = jnp.all(
        jnp.where(validc, strict & distinct, True)
    ) & (jnp.sum(validc.astype(jnp.int32)) <= T)

    row_for_col = lax.cond(
        fast_ok, lambda c: amin, _hungarian_slow, cost
    )
    picked = cost[jnp.clip(row_for_col, 0, T - 1), jnp.arange(D)]
    ok = (
        (row_for_col >= 0)
        & (row_for_col < T)
        & (picked < BIG / 2)
        & (picked <= jnp.float32(max_dist))
    )
    return jnp.where(ok, row_for_col, -1).astype(jnp.int32)
