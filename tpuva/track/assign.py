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

import jax
import jax.numpy as jnp
from jax import lax

BIG = jnp.float32(1e30)


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


def _hungarian_square(a: jnp.ndarray) -> jnp.ndarray:
    """Exact min-cost perfect matching on a square (n, n) matrix.

    Returns p: (n+1,) int32 where p[j] (j = 1..n, 1-indexed) is the 1-indexed
    row matched to column j. Classic potentials formulation: for each new
    row, grow a shortest-path tree over columns (Dijkstra with reduced
    costs), then augment along the recorded `way` pointers.
    """
    n = a.shape[0]
    INF = jnp.float32(1e38)

    def add_row(carry, i):
        u, v, p = carry  # u,v: (n+1,) potentials; p: (n+1,) col -> row
        p = p.at[0].set(i)

        def tree_cond(s):
            _u, _v, p_, _minv, _way, _used, j0 = s
            return p_[j0] != 0

        def tree_body(s):
            u, v, p_, minv, way, used, j0 = s
            used = used.at[j0].set(True)
            i0 = p_[j0]
            cur = a[i0 - 1, :] - u[i0] - v[1:]
            cols_used = used[1:]
            better = (~cols_used) & (cur < minv[1:])
            minv = minv.at[1:].set(jnp.where(better, cur, minv[1:]))
            way = way.at[1:].set(jnp.where(better, j0, way[1:]))
            mv = jnp.where(cols_used, INF, minv[1:])
            j1 = (jnp.argmin(mv) + 1).astype(jnp.int32)
            delta = mv[j1 - 1]
            # u[p[j]] += delta for used cols j; v[j] -= delta for used;
            # minv[j] -= delta for unused
            u = u.at[jnp.where(used, p_, 0)].add(jnp.where(used, delta, 0.0))
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
            p_ = p_.at[j0_].set(p_[j1])
            return p_, j1

        p, _ = lax.while_loop(aug_cond, aug_body, (p, j0))
        return (u, v, p), None

    u0 = jnp.zeros((n + 1,), jnp.float32)
    v0 = jnp.zeros((n + 1,), jnp.float32)
    p0 = jnp.zeros((n + 1,), jnp.int32)
    (_, _, p), _ = lax.scan(
        add_row, (u0, v0, p0), jnp.arange(1, n + 1, dtype=jnp.int32)
    )
    return p


@jax.jit
def hungarian_assign(cost: jnp.ndarray, max_dist) -> jnp.ndarray:
    """cost: (T, D) with BIG at invalid pairs. Returns (D,) int32
    row-for-column (-1 where unmatched or gated by max_dist)."""
    T, D = cost.shape
    n = max(T, D)
    # Replace BIG invalid entries and pad with an adaptive finite CAP:
    # CAP > (n+1) * max_valid_cost guarantees "maximize real matches, then
    # minimize their sum" (scipy's rectangular behavior), while keeping the
    # dual potentials small enough that float32 reduced costs retain
    # precision (1e30 padding would annihilate real cost differences).
    valid = cost < BIG / 2
    maxv = jnp.max(jnp.where(valid, cost, 0.0))
    cap = maxv * (n + 1) + 1.0
    c = jnp.where(valid, cost, cap)
    c = jnp.full((n, n), jnp.float32(0)).at[:, :].set(cap).at[:T, :D].set(c)
    p = _hungarian_square(c)
    row_for_col = p[1 : D + 1] - 1  # (D,) 0-indexed rows
    picked = cost[jnp.clip(row_for_col, 0, T - 1), jnp.arange(D)]
    ok = (
        (row_for_col >= 0)
        & (row_for_col < T)
        & (picked < BIG / 2)
        & (picked <= jnp.float32(max_dist))
    )
    return jnp.where(ok, row_for_col, -1).astype(jnp.int32)
