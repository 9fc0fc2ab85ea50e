"""Jittable, vmappable Hungarian assignment (Jonker-Volgenant shortest
augmenting path with dual potentials).

The reference escapes to scipy's `linear_sum_assignment` on CPU for every
image and decoder layer per training step (reference criterion.py:145) —
a device->host sync in the middle of the hot loop. Here the whole matcher
runs on device under jit with static shapes: cost matrices are
[n_rows, n_cols] with n_rows <= n_cols (instances x queries, 10 x 100 in
ZUTIS), batched via vmap over (batch, layer).

Padded (invalid) rows can be filled with any constant cost: a constant row
contributes the same total regardless of which column it takes, so the
restriction of the optimal assignment to valid rows is itself optimal — the
loss masks invalid rows out of the matched-cost sum.

Each row is inserted with a Dijkstra-style search over reduced costs; the
search adds one column per step and stops at the first unassigned column, so
it runs at most n_rows+1 steps for finite costs. NaN costs break that
invariant (NaN comparisons are all False, so no column ever improves and no
sink is found) — both while_loops therefore also carry explicit iteration
bounds (C and R+1) so a NaN-poisoned cost matrix returns a garbage-but-
terminating assignment instead of spinning the device forever; the loss
NaN guards downstream surface the divergence (criterion's matcher guard,
Trainer's finite-loss check).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(jnp.inf)


def hungarian(cost: jnp.ndarray) -> jnp.ndarray:
    """cost: [R, C] float with R <= C. Returns col4row [R] int32: the column
    assigned to each row in a minimum-total-cost perfect matching of rows."""
    R, C = cost.shape
    assert R <= C, f"hungarian expects R <= C, got {cost.shape}"
    cost = cost.astype(jnp.float32)

    def insert_row(carry, cur_row):
        u, v, col4row, row4col = carry

        def dijkstra(state):
            shortest, path, sc, sr, i, minval, _, it = state
            sr = sr.at[i].set(True)
            reduced = minval + cost[i] - u[i] - v  # [C]
            better = (reduced < shortest) & ~sc
            shortest = jnp.where(better, reduced, shortest)
            path = jnp.where(better, i, path)
            masked = jnp.where(sc, _INF, shortest)
            j = jnp.argmin(masked)
            minval = masked[j]
            sc = sc.at[j].set(True)
            nxt = row4col[j]
            # the C-iteration bail only fires on non-finite costs (see
            # module docstring): force a sink so the loop terminates
            sink = jnp.where((nxt < 0) | (it >= C), j, -1)
            return shortest, path, sc, sr, nxt, minval, sink, it + 1

        def not_done(state):
            return state[-2] < 0

        init = (
            jnp.full((C,), _INF),
            jnp.full((C,), -1, jnp.int32),
            jnp.zeros((C,), bool),
            jnp.zeros((R,), bool),
            cur_row,
            jnp.float32(0.0),
            jnp.int32(-1),
            jnp.int32(1),
        )
        shortest, path, sc, sr, _, minval, sink, _ = jax.lax.while_loop(
            not_done, dijkstra, init
        )

        # dual updates
        u = u.at[cur_row].add(minval)
        other = sr & (jnp.arange(R) != cur_row)
        delta_r = minval - shortest[col4row]  # [R] (garbage where col4row<0)
        u = jnp.where(other, u + delta_r, u)
        v = jnp.where(sc, v - (minval - shortest), v)

        # augment along the alternating path back to cur_row; alternating
        # paths visit each row at most once, so R+1 steps bound the loop
        # (the bound only binds when `path` is NaN-corrupted garbage)
        def augment(state):
            col4row, row4col, j, done, it = state
            i = path[j]
            row4col = row4col.at[j].set(i)
            prev = col4row[i]
            col4row = col4row.at[i].set(j)
            return col4row, row4col, prev, (i == cur_row) | (it > R), it + 1

        def not_aug_done(state):
            return ~state[-2]

        col4row, row4col, _, _, _ = jax.lax.while_loop(
            not_aug_done, augment, (col4row, row4col, sink, False,
                                    jnp.int32(1))
        )
        return (u, v, col4row, row4col), None

    u0 = jnp.zeros((R,))
    v0 = jnp.zeros((C,))
    col4row0 = jnp.full((R,), -1, jnp.int32)
    row4col0 = jnp.full((C,), -1, jnp.int32)
    (u, v, col4row, row4col), _ = jax.lax.scan(
        insert_row, (u0, v0, col4row0, row4col0), jnp.arange(R, dtype=jnp.int32)
    )
    return col4row


def batched_hungarian(cost: jnp.ndarray) -> jnp.ndarray:
    """cost: [..., R, C] -> col4row [..., R]. vmaps over leading axes."""
    flat = cost.reshape((-1,) + cost.shape[-2:])
    out = jax.vmap(hungarian)(flat)
    return out.reshape(cost.shape[:-2] + (cost.shape[-2],))
