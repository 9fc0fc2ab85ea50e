"""Jitted training and evaluation steps.

The reference's per-iteration hot loop (reference trainer.py:122-250) does:
forward -> Criterion (with a GPU->CPU scipy round-trip per image/layer) ->
backward -> AdamW step -> PolyLR step -> in-training semantic mIoU metrics.
Here the entire iteration — forward, Hungarian matching, loss, gradients,
optimiser update, and the confusion-matrix metric update — is one XLA program
(`train_step`), donated in-place, with no host synchronisation.

Batches are fixed-shape dicts:
  image:          [b, 3, H, W] float32 (normalised)
  instance_masks: [b, N_max, H, W] float {0,1} (padded)
  instance_valid: [b, N_max] bool
  semantic_mask:  [b, H, W] int32 (ignore_index outside labels)
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from zutis_tpu.engine.metrics import confusion_update
from zutis_tpu.losses.criterion import criterion_loss


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            params=params,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    text_embeddings: jnp.ndarray,
    n_categories: int,
    ignore_index: int = 255,
    weight_ce_loss: float = 1.0,
    weight_mask_loss: float = 1.0,
    weight_dice_loss: float = 1.0,
    weight_bce_loss: float = 1.0,
):
    """Returns a jitted (state, batch) -> (state, metrics) step function."""

    def loss_fn(params, batch):
        out = model.apply({"params": params}, batch["image"])
        losses = criterion_loss(
            out["mask_proposals"],
            batch["instance_masks"],
            batch["instance_valid"],
            out["patch_tokens"],
            batch["semantic_mask"],
            text_embeddings,
            weight_ce_loss=weight_ce_loss,
            weight_mask_loss=weight_mask_loss,
            weight_dice_loss=weight_dice_loss,
            weight_bce_loss=weight_bce_loss,
            ignore_index=ignore_index,
        )
        return losses["loss"], (losses, out)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(
        state: TrainState, batch: Dict[str, jnp.ndarray],
        confusion_acc: jnp.ndarray = None,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        # confusion_acc: optional [n_cat, n_cat] f32 running histogram —
        # when given, metrics["confusion"] is the UPDATED accumulator
        # (acc + this step's histogram), fused into the step program so the
        # training loop never pays a separate per-step device dispatch for
        # metric accumulation (measured ~11 ms/iter on the critical path
        # as an op-by-op add under the tunnelled runtime, PERF.md).
        (loss, (losses, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1
        )

        # in-training semantic metrics (reference trainer.py:156-188): the
        # criterion already built the full-resolution logits — reuse its
        # argmax instead of a second [b, n_cat, H, W] resize (identical:
        # the bilinear resize is linear per channel, so dot-then-resize ==
        # resize-then-dot)
        confusion = confusion_update(
            batch["semantic_mask"], losses["sem_pred"], n_categories
        )
        if confusion_acc is not None:
            confusion = confusion_acc + confusion
        metrics = {
            "loss": loss,
            "ce_loss": losses["ce_loss"],
            "mask_loss": losses["mask_loss"],
            "confusion": confusion,
        }
        return new_state, metrics

    return train_step


def make_eval_step(model, text_embeddings: jnp.ndarray):
    """Jitted eval forward: image -> (semantic argmax at input size, raw
    outputs). Semantic resize to original image size happens in the caller
    (sizes vary per dataset)."""

    @jax.jit
    def eval_step(params, image):
        out = model.apply({"params": params}, image)
        logits = jnp.einsum(
            "nc,bhwc->bnhw", text_embeddings, out["patch_tokens"],
            preferred_element_type=jnp.float32,
        )
        return out, logits

    return eval_step
