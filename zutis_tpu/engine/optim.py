"""Optimiser factory: AdamW with encoder learning-rate scaling + PolyLR.

Behavioural contract (reference utils/utils.py:179-197 `get_optimiser` /
`get_lr_scheduler`, utils/scheduler.py:4-12 `PolyLR`): AdamW with base lr
(5e-5 in configs), the CLIP encoder group at lr x 0.1, weight decay 0.05 on
every group; PolyLR multiplies the base lr by (1 - iter/total)^0.9 with a
floor of 1e-6, stepped once per iteration.

optax mapping: scale_by_adam -> add_decayed_weights -> per-subtree lr
multiplier -> scale by -schedule. Applying the encoder multiplier after the
weight-decay add reproduces torch-AdamW's coupling of weight decay to the
group learning rate.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def poly_lr_schedule(
    base_lr: float, n_iters: int, power: float = 0.9, floor: float = 1e-6
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    def schedule(step):
        frac = 1.0 - jnp.minimum(step, n_iters) / n_iters
        return jnp.maximum(base_lr * frac ** power, floor)

    return schedule


def _scale_subtrees(multipliers: dict) -> optax.GradientTransformation:
    """Multiply updates under top-level keys by per-key factors (default 1)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        new = {
            k: jax.tree_util.tree_map(
                lambda u, m=multipliers.get(k, 1.0): u * m, v
            )
            for k, v in updates.items()
        }
        return new, state

    return optax.GradientTransformation(init, update)


def _zero_frozen_stats() -> optax.GradientTransformation:
    """Zero every update whose leaf is a FrozenBatchNorm running statistic
    (`running_mean` / `running_var`, models/resnet.py): the reference keeps
    BN buffers fixed under frozen_bn (networks/zutis.py:43) — without this
    mask, AdamW's decoupled weight decay would still erode them."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def mask(path, u):
            leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if leaf in ("running_mean", "running_var"):
                return jnp.zeros_like(u)
            return u

        return jax.tree_util.tree_map_with_path(mask, updates), state

    return optax.GradientTransformation(init, update)


def make_optimizer(
    base_lr: float = 5e-5,
    n_iters: int = 20000,
    weight_decay: float = 0.05,
    encoder_lr_scale: float = 0.1,
    power: float = 0.9,
    floor: float = 1e-6,
) -> optax.GradientTransformation:
    schedule = poly_lr_schedule(base_lr, n_iters, power, floor)
    return optax.chain(
        optax.scale_by_adam(),
        optax.add_decayed_weights(weight_decay),
        _scale_subtrees({"encoder": encoder_lr_scale}),
        _zero_frozen_stats(),
        optax.scale_by_schedule(lambda s: -schedule(s)),
    )
