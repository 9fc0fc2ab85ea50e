"""Multi-head attention core.

One entry point, `dot_product_attention`, with selectable implementations:
  - "xla":    jnp einsum softmax attention (XLA fuses this well on TPU).
  - "pallas": fused FlashAttention-style Pallas kernel (ops/flash_attention.py)
              — avoids materialising the [b, h, sq, sk] logits in HBM.
  - "auto":   resolves via the ZUTIS_TPU_ATTN env var ("pallas"/"xla");
              defaults to xla BY MEASUREMENT (round 3, real v5e chip,
              PALLAS_QUALIFY.json): at the encoder shapes (seq 577,
              head_dim 64) every tuned Pallas variant — including jax's own
              TPU flash kernel at aligned 640 blocks — ran 4.2-4.6 ms/layer
              isolated vs the tuned XLA path's 2.05 ms/layer in-program.
              At head_dim 64 the kernel's QK^T uses the MXU at 50% depth and
              cannot hide the VPU softmax, while XLA's bf16-logits strategy
              pipelines across layers. (An earlier tunnel wedge on Pallas
              dispatches no longer reproduces — see PALLAS_QUALIFY.json
              stage "tiny" — so stability is NOT the reason for the
              default.) Retry Pallas where flash attention usually wins:
              much longer sequences (>=2k, where the [s,s] logits stop
              fitting in VMEM-friendly tiles) and/or head_dim >=128 filling
              the MXU depth. Falls back to xla whenever a dense additive
              `bias` is supplied (the kernel supports only key-validity
              masks, which is all the models need).

Softmax statistics always accumulate in float32 regardless of the compute
dtype (bf16 activations on TPU).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def _resolve_impl(impl: str, bias) -> str:
    if impl == "auto":
        pref = os.environ.get("ZUTIS_TPU_ATTN", "xla")
        impl = (
            "pallas"
            if pref == "pallas" and bias is None
            and jax.default_backend() == "tpu"
            else "xla"
        )
    if impl == "pallas" and bias is not None:
        # the fused kernel supports key-validity masks only; a dense additive
        # bias (e.g. the text tower's causal mask) must take the xla path
        # rather than be silently dropped (ADVICE r2)
        impl = "xla"
    return impl


def _softmax_weights(logits, scale, bias, kv_mask, compute_dtype):
    """Softmax over the last axis with f32 statistics; logits arrive
    pre-scale in f32, shaped [b, h, sq, sk]."""
    logits = logits * scale
    if compute_dtype == jnp.float32:
        if bias is not None:
            logits = logits + bias.astype(jnp.float32)
        if kv_mask is not None:
            logits = jnp.where(kv_mask[:, None, None, :] > 0, logits, -1e30)
        w = jax.nn.softmax(logits, axis=-1)
        if kv_mask is not None:
            # all-keys-masked items get ZERO weights (softmax's max-shift
            # would otherwise hand them uniform 1/sk over invalid keys) —
            # same convention as the bf16 fast path's underflow + guard
            any_valid = jnp.any(kv_mask > 0, axis=-1)  # [b]
            w = w * any_valid[:, None, None, None]
        return w
    # bf16 fast path: max-free softmax. The row-max subtraction exists
    # only for OVERFLOW safety; clamping from above at 80 (exp(80)~5.5e34,
    # row sums < 3e37 << f32 max) gives the same safety with one fewer
    # full pass over the [b,h,sq,sk] tensor — the softmax passes are
    # this path's single largest cost. Values beyond 80 only occur where
    # softmax already saturates. The clamp happens AFTER the bias add
    # (same fused cost) so safety holds for any bias, and it is one-sided:
    # very negative logits need no clamp (exp underflows to exactly 0,
    # which is the point of a -inf masking bias — a two-sided clip would
    # collapse -inf masks onto the same value as saturated-low legit
    # logits and leak weight to masked keys). ENVELOPE ASSUMPTION: if two
    # or more scaled logits in a row exceed 80 the clamp erases their
    # relative order (both map to 80 -> even split). ZUTIS/CLIP stay far
    # inside this: q/k come out of LN-scaled projections (scaled logits
    # observed O(10)) and biases are either non-positive masks or ToMe's
    # proportional log-size bias, which is positive but bounded by
    # log(n_tokens) ~ 6.4 (ops/tome.py). Callers with unbounded logits
    # must use f32 compute, which takes the exact path.
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    logits = jnp.minimum(logits, 80.0)
    if kv_mask is not None:
        # -200: exp underflows to exactly 0, so masked keys get zero
        # weight without re-introducing overflow risk
        logits = jnp.where(kv_mask[:, None, None, :] > 0, logits, -200.0)
    e = jnp.exp(logits)
    # the denominator guard covers the all-keys-masked row (every
    # exp(-200) underflows to exactly 0): those rows produce 0-weights
    # rather than NaN. The guard is the smallest NORMAL f32 (not a round
    # 1e-30) so rows whose legitimate logits sit near the underflow edge
    # (sums down to ~1e-37) are renormalised exactly instead of squashed;
    # TPU flushes f32 denormals, so anything below `tiny` is 0 anyway.
    tiny = jnp.finfo(jnp.float32).tiny
    return e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), tiny)


def dot_product_attention(
    q: jnp.ndarray,  # [b, h, sq, d]
    k: jnp.ndarray,  # [b, h, sk, d]
    v: jnp.ndarray,  # [b, h, sk, d]
    bias=None,  # broadcastable to [b, h, sq, sk]
    kv_mask=None,  # [b, sk] valid-key mask
    impl: str = "auto",
) -> jnp.ndarray:
    impl = _resolve_impl(impl, bias)
    if impl == "pallas":
        from zutis_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, kv_mask=kv_mask)
    scale = q.shape[-1] ** -0.5
    # bf16 activations: materialise the [b,h,sq,sk] logits in bf16 (the MXU
    # still accumulates fp32 and rounds once at the store) — the logits
    # tensor dominates HBM traffic on this path; softmax statistics are
    # computed in fp32 via the fused upcast in _softmax_weights.
    store_dtype = q.dtype  # logits stored in the compute dtype
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=store_dtype
    ).astype(jnp.float32)
    weights = _softmax_weights(logits, scale, bias, kv_mask, q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v)


def dot_product_attention_bshd(
    q: jnp.ndarray,  # [b, sq, h, d]
    k: jnp.ndarray,  # [b, sk, h, d]
    v: jnp.ndarray,  # [b, sk, h, d]
    bias=None,  # broadcastable to [b, h, sq, sk]
    kv_mask=None,  # [b, sk] valid-key mask
    impl: str = "auto",
) -> jnp.ndarray:
    """Attention over head-split projections in their NATIVE [b, s, h, d]
    layout (a free reshape of the projection output). On the XLA path the
    head axis is a dot batch dim read in place, so no [b,s,hd] -> [b,h,s,d]
    transpose is ever materialised — the r2 program spent ~4 ms/step on
    exactly those copies (3 per encoder layer; tools/trace_report.py).
    Returns [b, sq, h, d]."""
    impl = _resolve_impl(impl, bias)
    if impl == "pallas":
        from zutis_tpu.ops.flash_attention import flash_attention

        out = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), kv_mask=kv_mask,
        )
        return out.transpose(0, 2, 1, 3)
    scale = q.shape[-1] ** -0.5
    store_dtype = q.dtype  # logits stored in the compute dtype
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=store_dtype
    ).astype(jnp.float32)
    weights = _softmax_weights(logits, scale, bias, kv_mask, q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v)
