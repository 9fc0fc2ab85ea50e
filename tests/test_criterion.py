"""Criterion parity vs a torch+scipy oracle implementing the reference math
(reference criterion.py:63-161) with variable-length instances."""
import numpy as np
import torch
import torch.nn.functional as F
from scipy.optimize import linear_sum_assignment

import jax.numpy as jnp

from zutis_tpu.losses.criterion import criterion_loss


def oracle(mask_proposals, gt_masks_list, patch_tokens, gt_semantic, text_emb,
           ignore_index=255):
    b, L, Q = mask_proposals.shape[:3]
    H, W = gt_semantic.shape[-2:]
    toks = torch.from_numpy(patch_tokens).permute(0, 3, 1, 2)
    toks = F.interpolate(toks, size=(H, W), mode="bilinear")
    logits = torch.einsum("nc,bchw->bnhw", torch.from_numpy(text_emb), toks)
    ce = F.cross_entropy(logits, torch.from_numpy(gt_semantic).long(),
                         ignore_index=ignore_index).item()

    mask_loss = 0.0
    for i in range(b):
        gt = torch.from_numpy(gt_masks_list[i]).float().flatten(1)  # [N, HW]
        if gt.sum() == 0:
            continue
        props = torch.from_numpy(mask_proposals[i])  # [L, Q, h, w]
        props = F.interpolate(props, size=(H, W), mode="bilinear").flatten(2)
        for l in range(L):
            dt = props[l]  # [Q, HW]
            num = 2 * torch.einsum("nc,mc->nm", dt, gt)
            den = dt.sum(-1)[:, None] + gt.sum(-1)[None, :]
            dice = (1 - (num + 1) / (den + 1)).permute(1, 0)  # [N, Q]
            n_q, n_i = dt.shape[0], gt.shape[0]
            bce = F.binary_cross_entropy(
                dt[:, None].repeat(1, n_i, 1), gt[None].repeat(n_q, 1, 1),
                reduction="none").mean(-1).permute(1, 0)
            cost = (dice + bce).numpy()
            rows, cols = linear_sum_assignment(cost)
            mask_loss += cost[rows, cols].sum()
    return ce, mask_loss / b


def test_criterion_matches_oracle():
    rng = np.random.RandomState(0)
    b, L, Q, h, w, H, W, n_cat, td, n_max = 2, 3, 8, 6, 6, 24, 24, 5, 16, 4
    props = rng.rand(b, L, Q, h, w).astype(np.float32)
    patch_tokens = rng.randn(b, h, w, td).astype(np.float32)
    text_emb = rng.randn(n_cat, td).astype(np.float32)
    sem = rng.randint(0, n_cat, (b, H, W)).astype(np.int32)
    sem[0, :4] = 255  # some ignored pixels

    counts = [3, 2]
    gt_list = [(rng.rand(c, H, W) > 0.6).astype(np.float32) for c in counts]
    gt_padded = np.zeros((b, n_max, H, W), np.float32)
    valid = np.zeros((b, n_max), bool)
    for i, g in enumerate(gt_list):
        gt_padded[i, :len(g)] = g
        valid[i, :len(g)] = True

    want_ce, want_mask = oracle(props, gt_list, patch_tokens, sem, text_emb)
    out = criterion_loss(
        jnp.asarray(props), jnp.asarray(gt_padded), jnp.asarray(valid),
        jnp.asarray(patch_tokens), jnp.asarray(sem), jnp.asarray(text_emb),
    )
    np.testing.assert_allclose(float(out["ce_loss"]), want_ce, rtol=1e-4)
    np.testing.assert_allclose(float(out["mask_loss"]), want_mask, rtol=1e-4)


def test_bounded_ce_matches_log_softmax():
    """bounded=True (max-free single-pass CE) must equal the log_softmax
    path bit-for-tolerance on bounded logits, in both layouts."""
    from zutis_tpu.losses.criterion import cross_entropy_ignore
    rng = np.random.RandomState(2)
    b, H, W, n = 2, 9, 7, 6
    labels = rng.randint(0, n, (b, H, W)).astype(np.int32)
    labels[0, :3] = 255
    logits_last = jnp.asarray(rng.uniform(-1, 1, (b, H, W, n)).astype(np.float32))
    want = cross_entropy_ignore(logits_last, jnp.asarray(labels), 255,
                                channels_last=True, bounded=False)
    got = cross_entropy_ignore(logits_last, jnp.asarray(labels), 255,
                               channels_last=True, bounded=True)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
    logits_first = jnp.transpose(logits_last, (0, 3, 1, 2))
    got_cf = cross_entropy_ignore(logits_first, jnp.asarray(labels), 255,
                                  channels_last=False, bounded=True)
    np.testing.assert_allclose(float(got_cf), float(want), rtol=1e-6)


def test_sem_pred_matches_full_res_argmax():
    """criterion's sem_pred (argmax of its own resized-token logits) must
    reproduce the train step's former dot-then-resize argmax
    (reference trainer.py:156-188)."""
    from zutis_tpu.ops.resize import resize_2d
    rng = np.random.RandomState(3)
    b, L, Q, h, w, H, W, n_cat, td, n_max = 1, 2, 6, 5, 5, 20, 20, 4, 8, 2
    props = rng.rand(b, L, Q, h, w).astype(np.float32)
    patch_tokens = rng.randn(b, h, w, td).astype(np.float32)
    text_emb = rng.randn(n_cat, td).astype(np.float32)
    sem = rng.randint(0, n_cat, (b, H, W)).astype(np.int32)
    gt = (rng.rand(b, n_max, H, W) > 0.6).astype(np.float32)
    out = criterion_loss(
        jnp.asarray(props), jnp.asarray(gt),
        jnp.ones((b, n_max), bool), jnp.asarray(patch_tokens),
        jnp.asarray(sem), jnp.asarray(text_emb),
    )
    # the pre-r4 train-step path: dot at feature res, resize logits, argmax
    logits = jnp.einsum("nc,bhwc->bnhw", jnp.asarray(text_emb),
                        jnp.asarray(patch_tokens),
                        preferred_element_type=jnp.float32)
    logits = resize_2d(logits, (H, W), mode="linear")
    want = jnp.argmax(logits, axis=1).astype(jnp.int32)
    assert out["sem_pred"].shape == (b, H, W)
    np.testing.assert_array_equal(np.asarray(out["sem_pred"]), np.asarray(want))


def test_empty_image_contributes_zero():
    rng = np.random.RandomState(1)
    b, L, Q, h, H, n_cat, td, n_max = 1, 2, 4, 4, 8, 3, 8, 2
    props = rng.rand(b, L, Q, h, h).astype(np.float32)
    out = criterion_loss(
        jnp.asarray(props),
        jnp.zeros((b, n_max, H, H), jnp.float32),
        jnp.zeros((b, n_max), bool),
        jnp.asarray(rng.randn(b, h, h, td).astype(np.float32)),
        jnp.zeros((b, H, H), jnp.int32),
        jnp.asarray(rng.randn(n_cat, td).astype(np.float32)),
    )
    assert float(out["mask_loss"]) == 0.0


def test_all_empty_gt_image_contributes_zero_mask_loss():
    """Reference criterion.py:114-116 skips an image whose GT masks sum to
    zero PIXELS — even when validity flags are True (augmentation can wipe
    every object's pixels while instance_valid stays set)."""
    rng = np.random.RandomState(3)
    b, L, Q, N, H = 2, 2, 6, 3, 16
    props = jnp.asarray(rng.rand(b, L, Q, H, H).astype(np.float32))
    masks = np.zeros((b, N, H, H), np.float32)
    masks[0, 0, 2:8, 2:8] = 1.0  # image 0 has one real object
    valid = np.ones((b, N), bool)  # image 1: valid flags set, zero pixels
    tokens = jnp.asarray(rng.rand(b, 4, 4, 8).astype(np.float32))
    text = rng.rand(3, 8).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    sem = jnp.zeros((b, H, H), jnp.int32)

    out_both = criterion_loss(
        props, jnp.asarray(masks), jnp.asarray(valid), tokens,
        sem, jnp.asarray(text))
    # image 1 all-empty: mask loss must equal a batch where image 1 is
    # flagged fully invalid
    valid_ref = valid.copy()
    valid_ref[1] = False
    out_ref = criterion_loss(
        props, jnp.asarray(masks), jnp.asarray(valid_ref), tokens,
        sem, jnp.asarray(text))
    np.testing.assert_allclose(float(out_both["mask_loss"]),
                               float(out_ref["mask_loss"]), rtol=1e-6)
