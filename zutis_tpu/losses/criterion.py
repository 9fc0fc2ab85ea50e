"""Training criterion: pixel-wise text-embedding cross-entropy + Hungarian-
matched dice+BCE mask loss over all decoder layers.

Behavioural contract (reference criterion.py:8-161):
  * CE: patch tokens are bilinearly upsampled to the label size, logits are
    `text_embeddings . tokens`, cross-entropy with ignore_index, mean over
    non-ignored pixels (criterion.py:79-94).
  * Mask loss: per image and per decoder layer, proposals are bilinearly
    upsampled to the GT size and flattened; pairwise dice
    (criterion.py:26-41) and mean-pixel BCE (criterion.py:43-61) build an
    [n_instances, n_queries] cost matrix; the Hungarian-matched entries are
    summed over layers and images and divided by batch size
    (criterion.py:97-151). Images with empty GT contribute zero.

TPU-first re-design: everything is static-shape and jittable. Variable
instance counts are padded to `n_max` with a validity mask; padded cost rows
are overwritten with a constant so the matching over real rows is unchanged
(see ops/hungarian.py). The per-image python loop and the scipy host
round-trip (criterion.py:145) are replaced by a batched on-device matcher.
Pairwise BCE is decomposed into two matmuls so the MXU does it:
  mean_px BCE(d, g) = (-(log d - log(1-d)) . g - sum(log(1-d))) / HW.
Torch's BCE clamps log terms at -100; we match that.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from zutis_tpu.ops.hungarian import batched_hungarian
from zutis_tpu.ops.resize import resize_2d


def dice_cost(dt: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """dt: [..., Q, HW] in [0,1]; gt: [..., N, HW] in {0,1} -> [..., N, Q]."""
    numerator = 2.0 * jnp.einsum(
        "...nc,...qc->...nq", gt, dt, preferred_element_type=jnp.float32
    )
    denominator = dt.sum(-1)[..., None, :] + gt.sum(-1)[..., :, None]
    return 1.0 - (numerator + 1.0) / (denominator + 1.0)


def bce_cost(dt: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Pairwise mean-pixel binary cross entropy -> [..., N, Q]."""
    hw = dt.shape[-1]
    log_d = jnp.clip(jnp.log(dt), -100.0)
    log_1md = jnp.clip(jnp.log1p(-dt), -100.0)
    term_g = jnp.einsum(
        "...nc,...qc->...nq", gt, log_d - log_1md,
        preferred_element_type=jnp.float32,
    )
    term_const = log_1md.sum(-1)[..., None, :]
    return -(term_g + term_const) / hw


def dice_cost_2d(dt: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """dice_cost with dt [b, Q, H, W] / gt [b, N, H, W] contracted in place:
    no [b, Q, H*W] flatten — the reshape of a tiled (H, W) layout is a
    physical 470 MB copy per layer on TPU (measured ~19 ms/step of pure
    reshapes in the r3 train trace)."""
    numerator = 2.0 * jnp.einsum(
        "bnhw,bqhw->bnq", gt, dt, preferred_element_type=jnp.float32
    )
    denominator = (dt.sum((-2, -1))[:, None, :]
                   + gt.sum((-2, -1))[:, :, None])
    return 1.0 - (numerator + 1.0) / (denominator + 1.0)


def bce_cost_2d(dt: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """bce_cost on unflattened [b, ., H, W] tensors (same decomposition)."""
    hw = dt.shape[-2] * dt.shape[-1]
    log_d = jnp.clip(jnp.log(dt), -100.0)
    log_1md = jnp.clip(jnp.log1p(-dt), -100.0)
    term_g = jnp.einsum(
        "bnhw,bqhw->bnq", gt, log_d - log_1md,
        preferred_element_type=jnp.float32,
    )
    term_const = log_1md.sum((-2, -1))[:, None, :]
    return -(term_g + term_const) / hw


def cross_entropy_ignore(
    logits: jnp.ndarray,  # [b, n_cat, H, W] or [b, H, W, n_cat]
    labels: jnp.ndarray,  # [b, H, W] int
    ignore_index: int,
    channels_last: bool = False,
    bounded: bool = False,
) -> jnp.ndarray:
    """channels_last=True puts the class axis on TPU lanes: the softmax
    statistics become lane reductions and the label pick a lane gather —
    the class-major form made XLA materialise a transposed [b, H, W, n]
    copy anyway (r3 train trace, 8.6 ms bitcast_reduce_fusion).

    bounded=True asserts |logits| is small (the criterion's logits are
    unit-norm tokens . unit-norm text, so |x| <= 1): CE becomes the
    max-free log(sum exp(x)) - x_label, mathematically identical to
    log_softmax + pick but with NO [.., n_cat] logp materialisation —
    the r4 train trace charged ~40 ms/step to the log_softmax passes
    over the [8, 384, 384, 919] float32 tensor."""
    axis = -1 if channels_last else 1
    x = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    if bounded:
        # exp input clamped at 30: exact whenever |logits| <= 30 (production
        # logits are <= 1), and a caller violating the bound gets a finite
        # wrong loss instead of a silent inf. STRAIGHT-THROUGH clamp: a
        # plain jnp.minimum costs 22 ms/step at the reference config
        # (139.5 -> 161.8 measured) because its VJP stores an x<30
        # predicate over the [8, 384, 384, 919] logits; the identity
        # gradient is exact for the in-bound case and exp's own VJP
        # (exp of the clamped value) stays bounded out of bound.
        xc = x + jax.lax.stop_gradient(jnp.minimum(x, 30.0) - x)
        sumexp = jnp.sum(jnp.exp(xc), axis=axis)
        # label pick as a one-hot masked reduce, NOT take_along_axis: the
        # per-pixel lane gather (and its scatter VJP) over the
        # [8, 384, 384, 919] logits cost ~18 ms/step in the r4 trace; the
        # masked reduce is bitwise identical (one nonzero term, adding
        # exact zeros), runs as a second lane reduction in the same pass
        # as sumexp, and its VJP is an elementwise mask.
        iota = jax.lax.broadcasted_iota(
            jnp.int32, x.shape, dimension=axis % x.ndim)
        if channels_last:
            onehot = iota == safe[..., None]
        else:
            onehot = iota == safe[:, None]
        picked = jnp.sum(jnp.where(onehot, x, 0.0), axis=axis)
        losses = jnp.where(valid, jnp.log(sumexp) - picked, 0.0)
        count = jnp.maximum(valid.sum(), 1)
        return losses.sum() / count
    logp = jax.nn.log_softmax(x, axis=axis)
    if channels_last:
        picked = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    else:
        picked = jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
    losses = jnp.where(valid, -picked, 0.0)
    count = jnp.maximum(valid.sum(), 1)
    return losses.sum() / count


class Criterion:
    """Callable mirroring the reference Criterion's interface, jit-friendly."""

    def __init__(
        self,
        text_embeddings: jnp.ndarray,  # [n_cat, text_dim]
        weight_ce_loss: float = 1.0,
        weight_mask_loss: float = 1.0,
        weight_dice_loss: float = 1.0,
        weight_bce_loss: float = 1.0,
        ignore_index: int = 255,
    ):
        self.text_embeddings = text_embeddings
        self.weight_ce_loss = weight_ce_loss
        self.weight_mask_loss = weight_mask_loss
        self.weight_dice_loss = weight_dice_loss
        self.weight_bce_loss = weight_bce_loss
        self.ignore_index = ignore_index

    def __call__(
        self,
        mask_proposals: jnp.ndarray,  # [b, L, Q, h, w] in [0,1]
        gt_instance_masks: jnp.ndarray,  # [b, N_max, H, W] float {0,1}
        instance_valid: jnp.ndarray,  # [b, N_max] bool
        patch_tokens: jnp.ndarray,  # [b, h, w, text_dim]
        gt_semantic_masks: jnp.ndarray,  # [b, H, W] int
    ) -> Dict[str, jnp.ndarray]:
        return criterion_loss(
            mask_proposals, gt_instance_masks, instance_valid,
            patch_tokens, gt_semantic_masks, self.text_embeddings,
            weight_ce_loss=self.weight_ce_loss,
            weight_mask_loss=self.weight_mask_loss,
            weight_dice_loss=self.weight_dice_loss,
            weight_bce_loss=self.weight_bce_loss,
            ignore_index=self.ignore_index,
        )


def criterion_loss(
    mask_proposals: jnp.ndarray,
    gt_instance_masks: jnp.ndarray,
    instance_valid: jnp.ndarray,
    patch_tokens: jnp.ndarray,
    gt_semantic_masks: jnp.ndarray,
    text_embeddings: jnp.ndarray,
    weight_ce_loss: float = 1.0,
    weight_mask_loss: float = 1.0,
    weight_dice_loss: float = 1.0,
    weight_bce_loss: float = 1.0,
    ignore_index: int = 255,
) -> Dict[str, jnp.ndarray]:
    b, L, Q = mask_proposals.shape[:3]
    n_max = gt_instance_masks.shape[1]
    H, W = gt_instance_masks.shape[-2:]
    assert n_max <= Q, (
        f"more instances ({n_max}) than queries ({Q}); ZUTIS matches each "
        f"instance to a distinct query (reference criterion.py:145)"
    )

    # ===== cross-entropy loss =====
    # NOT under jax.checkpoint: rematerialising the resize+einsum in the
    # backward pass measured 136.3 vs 128.1 ms/step at the reference config
    # — the recompute costs more than the logits residual traffic it saves.
    tokens = patch_tokens.transpose(0, 3, 1, 2)  # [b, c, h, w]
    tokens = resize_2d(tokens, (H, W), mode="linear")
    # class axis LAST (TPU lanes): same math, no transposed duplicate
    logits = jnp.einsum(
        "nc,bchw->bhwn", text_embeddings, tokens,
        preferred_element_type=jnp.float32,
    )
    # bounded=True: tokens are per-pixel L2-normalised by the model and the
    # bilinear resize is a convex combination, text rows are unit-norm, so
    # |logits| <= 1 — the max-free CE is exact (see cross_entropy_ignore)
    ce = cross_entropy_ignore(logits, gt_semantic_masks, ignore_index,
                              channels_last=True, bounded=True)
    # in-training semantic prediction for the metrics, reusing THIS logits
    # tensor: argmax(resize(einsum)) == argmax(einsum(resize)) because the
    # resize is linear per channel — the train step used to rebuild a
    # second full-resolution [b, n_cat, H, W] copy just for this argmax
    sem_pred = jax.lax.stop_gradient(
        jnp.argmax(logits, axis=-1).astype(jnp.int32))

    # ===== mask loss =====
    gt4 = gt_instance_masks.astype(jnp.float32)  # [b, N, H, W]

    # Dice never needs the full-resolution upsample: <gt, resize(P)> ==
    # <resize^T(gt), P> because the bilinear resize is linear, so gt
    # projects DOWN to the feature grid ONCE (it is layer-invariant) and
    # every layer's dice numerator/denominator reduces over [b, ., h, w]
    # instead of re-reading the 472 MB [b, Q, H, W] tensor (r4 train
    # trace). BCE keeps the full-res path — log(up) is not linear in P.
    hf, wf = mask_proposals.shape[-2:]

    def _resize_hw(z):
        return resize_2d(z, (H, W), mode="linear")

    gt_t = jax.linear_transpose(
        _resize_hw,
        jax.ShapeDtypeStruct((b, n_max, hf, wf), jnp.float32),
    )(gt4)[0]  # [b, N, hf, wf] = W_h^T gt W_w
    ones_t = jax.linear_transpose(
        _resize_hw, jax.ShapeDtypeStruct((1, 1, hf, wf), jnp.float32),
    )(jnp.ones((1, 1, H, W), jnp.float32))[0][0, 0]  # [hf, wf] column sums
    gt_area = gt4.sum((-2, -1))  # [b, N]

    def dice_cost_projected(p_l: jnp.ndarray) -> jnp.ndarray:
        """dice_cost_2d(resize(p_l), gt4) computed at feature resolution
        (exact up to fp reassociation; the straight-through clip the BCE
        path applies moves `up` by <= 1e-7, below the oracle tolerance)."""
        numerator = 2.0 * jnp.einsum(
            "bnij,bqij->bnq", gt_t, p_l, preferred_element_type=jnp.float32)
        sum_up = jnp.einsum(
            "bqij,ij->bq", p_l, ones_t, preferred_element_type=jnp.float32)
        denominator = sum_up[:, None, :] + gt_area[:, :, None]
        return 1.0 - (numerator + 1.0) / (denominator + 1.0)

    def cost_layer(proposals_l: jnp.ndarray) -> jnp.ndarray:
        """proposals_l: [b, Q, h, w] -> dice+BCE cost [b, N, Q]."""
        up = resize_2d(proposals_l, (H, W), mode="linear")
        # fp guard for the log()s below: bilinear output is in [0,1] up to
        # fp error. STRAIGHT-THROUGH clip — the reference doesn't clamp at
        # all (its torch interpolate feeds BCE directly), so an identity
        # gradient matches reference backward semantics AND avoids storing
        # [b, Q, H, W] clip predicates for the VJP (~19 ms/step, r3 trace)
        up = up + jax.lax.stop_gradient(jnp.clip(up, 0.0, 1.0) - up)
        return (
            weight_dice_loss * dice_cost_projected(proposals_l)
            + weight_bce_loss * bce_cost_2d(up, gt4)
        )

    # unrolled loop over decoder layers, each under jax.checkpoint.
    # jax.checkpoint is ESSENTIAL here: without it the backward pass saves
    # every layer's full-resolution upsampled proposals and cost tensors as
    # residuals ([L, b, Q, H, W] float32 — ~13 GB for the reference's
    # batch-8/384px/6-layer training config, which OOMs a 16 GB chip);
    # rematerialising them costs one extra resize matmul per layer. The
    # UNROLL (vs the r2 lax.scan) keeps the same peak memory — residuals per
    # layer are only [b, N, Q] costs — but lets XLA schedule and fuse across
    # layer boundaries instead of through a while-loop barrier (r3 train
    # trace: the scan body serialised 89 ms/step).
    costs = jnp.stack([jax.checkpoint(cost_layer)(mask_proposals[:, layer])
                       for layer in range(L)])  # [L, b, N, Q]

    # ONE batched matching over all L*b problems instead of L sequential
    # batched_hungarian calls: TPU executes the JV while-loops serially, so
    # L separate solves cost ~L x the trip time while the batched solve runs
    # the same trips over a [L*b, N, Q] problem set (r4 train trace: ~12 ms
    # of while-loop + small-fusion time at L=6). Matching results identical.
    # padded rows -> constant 0 so they never affect real-row matching
    cost_for_match = jnp.where(instance_valid[None, :, :, None], costs, 0.0)
    # NaN/inf guard: the JV matcher's while_loops never terminate on NaN
    # costs — a diverged training step must surface as a NaN loss (the
    # trainer raises on it), not hang the device forever. The matched
    # cost below still uses the unguarded values, so NaNs propagate to
    # the loss as they should.
    cost_for_match = jnp.nan_to_num(
        cost_for_match, nan=1e6, posinf=1e6, neginf=-1e6
    )
    col4rows = batched_hungarian(
        jax.lax.stop_gradient(cost_for_match).reshape(L * b, n_max, Q)
    ).reshape(L, b, n_max)  # [L, b, N]
    matched = jnp.take_along_axis(
        costs, col4rows[..., None], axis=-1)[..., 0]  # [L, b, N]
    matched = jnp.where(instance_valid[None], matched, 0.0)
    per_image_layers = matched.sum(-1)  # [L, b]
    # reference criterion.py:114-116 skips an image when its GT masks sum
    # to ZERO PIXELS — not merely when no row is flagged valid: augmentation
    # (extreme scale + crop) can wipe every sampled object's pixels while
    # instance_valid stays True, and matching those all-empty rows would add
    # nonzero dice+BCE cost the reference never pays
    gt_pixels = (
        gt_instance_masks * instance_valid[..., None, None]
    ).sum(axis=(1, 2, 3))
    per_image = jnp.where(gt_pixels > 0, per_image_layers.sum(0), 0.0)
    mask_loss = per_image.sum() / b

    loss = weight_mask_loss * mask_loss + weight_ce_loss * ce
    return {
        "loss": loss,
        "ce_loss": ce,
        "mask_loss": mask_loss,
        # [b, H, W] in-training semantic argmax (metrics; no grad)
        "sem_pred": sem_pred,
        # [L, b, N] matched query index per instance (for visualisation)
        "query_indices": col4rows,
    }
