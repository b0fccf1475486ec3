"""On-device rectangular linear assignment (Jonker-Volgenant style).

The reference matcher moves every cost matrix to the CPU and calls scipy's
``linear_sum_assignment`` per video (``pdvc/matcher.py:115-119``) — a
device→host sync inside the training step.  Here the same shortest
augmenting path algorithm runs on-device under ``jit`` with static shapes,
so Hungarian matching stays inside the compiled step (and vmaps over the
batch and decoder layers).

Layout: ``cost`` is (R, C) with R <= C; every row is assigned a distinct
column minimizing total cost (the reference calls scipy on (num_queries,
num_gt) — transpose to our layout).  Padded rows should carry a constant
cost (any value): a constant row cannot change which columns the real rows
prefer, so the restriction of the optimum to real rows is the real optimum.

Matches scipy's optimal cost exactly (ties may resolve to a different but
equal-cost permutation — parity tests compare total cost, per SURVEY.md §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# plain numpy scalar, NOT jnp.float32(...): a module-level jnp array would
# initialize the default JAX backend at import time (30s+ handshake on the
# tunneled TPU; an indefinite hang when the tunnel is down)
_INF = jnp.inf


def linear_sum_assignment(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve min-cost assignment. cost: (R, C), R <= C (static shapes).

    Returns col4row (R,) int32 — the column assigned to each row.
    """
    R, C = cost.shape
    if R > C:
        raise ValueError(f"need R <= C, got {cost.shape}")
    cost = cost.astype(jnp.float32)

    def assign_row(carry, cur_row):
        u, v, col4row, row4col = carry

        # Dijkstra over columns from cur_row until an unassigned column.
        def dijkstra_cond(s):
            _, _, _, _, _, _, sink = s
            return sink < 0

        def dijkstra_body(s):
            i, minVal, remaining, shortest, path, sr, sink = s
            # relax all remaining columns through row i
            reduced = minVal + cost[i] - u[i] - v          # (C,)
            lower = remaining & (reduced < shortest)
            path = jnp.where(lower, i, path)
            shortest = jnp.where(lower, reduced, shortest)
            # pick the remaining column with the smallest path cost
            masked = jnp.where(remaining, shortest, _INF)
            j = jnp.argmin(masked)
            minVal = masked[j]
            sr = sr.at[i].set(True)
            # if j is free we are done; else continue from its row
            free = row4col[j] < 0
            sink = jnp.where(free, j, -1)
            i = jnp.where(free, i, row4col[j])
            remaining = remaining.at[j].set(False)
            return (i, minVal, remaining, shortest, path, sr, sink)

        init = (cur_row, jnp.float32(0.0), jnp.ones((C,), bool),
                jnp.full((C,), _INF), jnp.zeros((C,), jnp.int32),
                jnp.zeros((R,), bool), jnp.int32(-1))
        i, minVal, remaining, shortest, path, sr, sink = jax.lax.while_loop(
            dijkstra_cond, dijkstra_body, init)

        # Update dual potentials (scipy _lsap.cpp update_dual_vectors).
        u = u.at[cur_row].add(minVal)
        other = sr & (jnp.arange(R) != cur_row)
        u = u + jnp.where(other, minVal - shortest[col4row], 0.0)
        visited_cols = ~remaining & (jnp.arange(C) != sink)
        v = v - jnp.where(visited_cols & (shortest < _INF),
                          minVal - shortest, 0.0)

        # Augment along the alternating path ending at sink.
        def aug_cond(s):
            _, _, done, _ = s
            return ~done

        def aug_body(s):
            col4row_, row4col_, _, j = s
            i = path[j]
            row4col_ = row4col_.at[j].set(i)
            prev = col4row_[i]
            col4row_ = col4row_.at[i].set(j)
            return (col4row_, row4col_, i == cur_row, prev)

        col4row, row4col, _, _ = jax.lax.while_loop(
            aug_cond, aug_body, (col4row, row4col, jnp.bool_(False), sink))
        return (u, v, col4row, row4col), None

    u0 = jnp.zeros((R,), jnp.float32)
    v0 = jnp.zeros((C,), jnp.float32)
    col4row0 = jnp.full((R,), -1, jnp.int32)
    row4col0 = jnp.full((C,), -1, jnp.int32)
    (_, _, col4row, _), _ = jax.lax.scan(
        assign_row, (u0, v0, col4row0, row4col0), jnp.arange(R))
    return col4row


def many_to_one_assignment(cost: jnp.ndarray, row_mask: jnp.ndarray,
                           rate: int = 4) -> jnp.ndarray:
    """Many-to-one assignment: up to ``rate`` columns per row.

    The reference's ``rl_indices`` (``pdvc/matcher.py:120-123``) solves the
    assignment on the cost matrix tiled ``rate``× along the gt axis, so each
    gt event can absorb up to ``rate`` distinct queries (used only by the
    vestigial ``caption_cost_type='rl'`` path).  Our layout transposes the
    reference's: rows are gt slots, columns queries, so the tiling happens
    along rows; tiled row ``r`` maps back to gt slot ``r % R``.

    cost: (R, C) with rate*R <= C; row_mask: (R,).
    Returns col4row (rate, R) int32 — ``rate`` distinct columns per row,
    jointly optimal over the tiled problem (matches scipy on the tiled
    matrix up to equal-cost ties).
    """
    R, C = cost.shape
    if rate * R > C:
        raise ValueError(f"need rate*R <= C, got rate={rate}, {cost.shape}")
    tiled = jnp.tile(cost, (rate, 1))
    tiled_mask = jnp.tile(row_mask, (rate,))
    col4row = masked_assignment(tiled, tiled_mask)
    return col4row.reshape(rate, R)


def masked_assignment(cost: jnp.ndarray, row_mask: jnp.ndarray) -> jnp.ndarray:
    """Assignment where only ``row_mask`` rows are real.

    Padded rows are replaced by constant-0 rows (cannot perturb the real
    rows' optimum) and still receive distinct columns, which callers ignore.
    cost: (R, C); row_mask: (R,) bool.  Returns col4row (R,) int32.
    """
    safe = jnp.where(row_mask[:, None], cost, 0.0)
    # Guard against non-finite entries leaking into the solver.
    safe = jnp.nan_to_num(safe, nan=1e9, posinf=1e9, neginf=-1e9)
    return linear_sum_assignment(safe)
