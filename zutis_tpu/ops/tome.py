"""Token merging (ToMe) for the CLIP ViT encoder — opt-in throughput lever.

Algorithmic token reduction in the spirit of "Token Merging: Your ViT But
Faster" (Bolya et al., ICLR 2023): between the attention and MLP of each
encoder block, the r most-similar token pairs are merged by bipartite soft
matching on that block's (head-averaged) attention keys, with per-token
sizes tracked for weighted-average merging and proportional attention.
Sequence length shrinks by a STATIC r per layer, so every shape stays
XLA-static and the whole schedule compiles once.

ZUTIS needs DENSE patch tokens at the full grid for mask proposals and the
text-space map (reference networks/zutis.py:472-532 — the hot path this
lever targets), so unlike classification ToMe we maintain an explicit
original-position -> current-token assignment, composed through every merge,
and gather the merged stream back to the dense grid ONCE after the last
block (models/vit.py). Merging identical tokens is mathematically exact
(weighted average of equal vectors + log-size proportional attention
reproduce dense attention); for natural images the accuracy cost is
measured, not assumed — see PERF.md's round-5 ToMe table.

TPU notes: the merge is gathers + one small [sa, sb] matmul + top_k + a
scatter-add per layer; all static shapes. No Pallas needed — the op is a
rounding error next to the encoder matmuls it removes.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def merge_schedule(s0: int, r: int, n_layers: int) -> list:
    """Per-layer effective merge counts for a stream starting at s0 tokens
    (CLS included, never merged). Mirrors the static python loop in
    models/vit.py so tests and FLOP accounting agree with the model."""
    out = []
    s = s0
    for _ in range(n_layers):
        sa, sb = (s + 1) // 2, s // 2
        r_eff = max(0, min(r, sa - 1, sb))
        out.append(r_eff)
        s -= r_eff
    return out


def tome_merge(
    x: jnp.ndarray,       # [b, s, d] residual stream AFTER the attn add
    metric: jnp.ndarray,  # [b, s, dm] similarity features (head-mean keys)
    size: jnp.ndarray,    # [b, s] f32 token sizes (number of merged patches)
    r: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Merge r tokens via bipartite soft matching.

    Tokens at even positions form set A (position 0 — CLS — protected),
    odd positions set B. Each A-token's best B match is scored by cosine
    similarity of `metric`; the r highest-scoring A-tokens merge into their
    B targets by size-weighted average.

    Returns (x_merged [b, s-r, d], size_merged [b, s-r],
    mapping [b, s] int32: old token index -> new token index) so callers can
    compose a dense-position assignment across layers.
    """
    b, s, d = x.shape
    sa, sb = (s + 1) // 2, s // 2
    assert 0 < r <= min(sa - 1, sb), (r, s)

    m32 = metric.astype(jnp.float32)
    m32 = m32 / jnp.maximum(
        jnp.linalg.norm(m32, axis=-1, keepdims=True), 1e-6)
    a_m, b_m = m32[:, ::2], m32[:, 1::2]
    scores = jnp.einsum("bad,bnd->ban", a_m, b_m)  # [b, sa, sb]
    # Padding-aware scoring (models/vit.py forward_padded): size-0 tokens
    # are padding — merging one is FREE (zero merge weight), so their rows
    # sort first (+2, above any cosine); a valid token merging into a
    # zero-size slot is LOSSLESS (the slot adopts its content exactly), so
    # those pairs rank next (+1.5). Both constants are garbage-independent,
    # making the schedule invariant to padding pixel content. All-positive
    # sizes (the dense path) leave every score untouched.
    pad_a, pad_b = size[:, ::2] <= 0, size[:, 1::2] <= 0
    scores = jnp.where(pad_a[:, :, None], 2.0, scores)
    scores = jnp.where((~pad_a)[:, :, None] & pad_b[:, None, :], 1.5, scores)
    scores = scores.at[:, 0, :].set(-jnp.inf)  # CLS never merges

    node_max = jnp.max(scores, axis=-1)      # [b, sa]
    node_idx = jnp.argmax(scores, axis=-1)   # [b, sa] best B per A
    # most-similar r A-tokens merge; the rest keep their own slot
    order = jnp.argsort(-node_max, axis=-1)  # [b, sa]
    src_idx = order[:, :r]                   # merged A-tokens
    unm_idx = order[:, r:]                   # kept A-tokens
    dst_idx = jnp.take_along_axis(node_idx, src_idx, axis=1)  # [b, r]
    n_unm = sa - r

    batch = jnp.arange(b)[:, None]
    # weighted-average merge: work on size-weighted tokens, divide at the end
    w = x.astype(jnp.float32) * size[..., None]
    w_a, w_b = w[:, ::2], w[:, 1::2]
    sz_a, sz_b = size[:, ::2], size[:, 1::2]
    unm_w = jnp.take_along_axis(w_a, unm_idx[..., None], axis=1)
    unm_sz = jnp.take_along_axis(sz_a, unm_idx, axis=1)
    src_w = jnp.take_along_axis(w_a, src_idx[..., None], axis=1)
    src_sz = jnp.take_along_axis(sz_a, src_idx, axis=1)
    dst_w = w_b.at[batch, dst_idx].add(src_w)
    dst_sz = sz_b.at[batch, dst_idx].add(src_sz)

    new_w = jnp.concatenate([unm_w, dst_w], axis=1)
    new_sz = jnp.concatenate([unm_sz, dst_sz], axis=1)
    # all-padding slots (size 0) resolve to zero vectors, not 0/0 NaNs;
    # for positive sizes the clamp is exact (dense path bitwise unchanged)
    x_new = (new_w / jnp.maximum(new_sz, 1e-6)[..., None]).astype(x.dtype)

    # old -> new index mapping (for dense-position assignment composition)
    map_a = jnp.zeros((b, sa), jnp.int32)
    map_a = map_a.at[batch, unm_idx].set(
        jnp.broadcast_to(jnp.arange(n_unm, dtype=jnp.int32)[None], (b, n_unm))
    )
    map_a = map_a.at[batch, src_idx].set(
        (n_unm + dst_idx).astype(jnp.int32))
    map_b = jnp.broadcast_to(
        (n_unm + jnp.arange(sb, dtype=jnp.int32))[None], (b, sb))
    mapping = jnp.zeros((b, s), jnp.int32)
    mapping = mapping.at[:, ::2].set(map_a)
    mapping = mapping.at[:, 1::2].set(map_b)
    return x_new, new_sz, mapping


def proportional_attn_bias(size: jnp.ndarray) -> jnp.ndarray:
    """log(size) additive attention bias, [b, 1, 1, s] — a key representing
    n merged patches should attract n patches' worth of softmax mass
    (exactly recovers dense attention when merged tokens were identical).
    Size-0 slots (padding on the padded path) are clamped to bias 0 rather
    than -inf — they are excluded by the kv_mask instead, keeping the bias
    finite; positive sizes (the dense path) are bitwise unchanged."""
    return jnp.log(jnp.maximum(size, 1.0))[:, None, None, :].astype(
        jnp.float32)
