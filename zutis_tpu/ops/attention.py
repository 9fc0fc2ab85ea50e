"""Multi-head attention core.

One entry point, `dot_product_attention`, with selectable implementations:
  - "xla":    jnp einsum softmax attention (XLA fuses this well on TPU).
  - "pallas": fused FlashAttention-style Pallas kernel (ops/flash_attention.py)
              — avoids materialising the [b, h, sq, sk] logits in HBM.
  - "auto":   resolves via the ZUTIS_TPU_ATTN env var ("pallas"/"xla");
              defaults to xla. Rationale: the current axon-tunnelled TPU
              runtime non-deterministically wedges on Pallas dispatches of
              ANY kernel (jax's own pallas flash_attention included — see
              bench.py's fast-path watchdog), so the fused kernel is opt-in
              rather than the silent default. Falls back to xla whenever a
              dense additive `bias` is supplied (the kernel supports only
              key-validity masks, which is all the models need).

Softmax statistics always accumulate in float32 regardless of the compute
dtype (bf16 activations on TPU).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jnp.ndarray,  # [b, h, sq, d]
    k: jnp.ndarray,  # [b, h, sk, d]
    v: jnp.ndarray,  # [b, h, sk, d]
    bias: Optional[jnp.ndarray] = None,  # broadcastable to [b, h, sq, sk]
    kv_mask: Optional[jnp.ndarray] = None,  # [b, sk] valid-key mask
    impl: str = "auto",
) -> jnp.ndarray:
    if impl == "auto":
        pref = os.environ.get("ZUTIS_TPU_ATTN", "xla")
        impl = (
            "pallas"
            if pref == "pallas" and bias is None
            and jax.default_backend() == "tpu"
            else "xla"
        )
    if impl == "pallas":
        from zutis_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, kv_mask=kv_mask)
    scale = q.shape[-1] ** -0.5
    # bf16 activations: materialise the [b,h,sq,sk] logits in bf16 (the MXU
    # still accumulates fp32 and rounds once at the store) — the logits
    # tensor dominates HBM traffic on this path, and softmax statistics are
    # computed in fp32 regardless via the fused upcast below.
    store_dtype = jnp.float32 if q.dtype == jnp.float32 else q.dtype
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=store_dtype
    )
    logits = logits.astype(jnp.float32) * scale
    if q.dtype == jnp.float32:
        if bias is not None:
            logits = logits + bias.astype(jnp.float32)
        if kv_mask is not None:
            logits = jnp.where(kv_mask[:, None, None, :] > 0, logits, -1e30)
        weights = jax.nn.softmax(logits, axis=-1)
    else:
        # bf16 fast path: max-free softmax. The row-max subtraction exists
        # only for overflow safety; clamping to +-80 (exp(80)~5.5e34, row
        # sums < 3e37 << f32 max) gives the same safety with one fewer
        # full pass over the [b,h,sq,sk] tensor — the softmax passes are
        # this path's single largest cost (measured: ~34ms of a 154ms
        # ViT-B/16 batch-64 forward). Values beyond +-80 only occur where
        # softmax already saturates.
        logits = jnp.clip(logits, -80.0, 80.0)
        if bias is not None:
            logits = logits + bias.astype(jnp.float32)
        if kv_mask is not None:
            # -200: exp underflows to exactly 0, so masked keys get zero
            # weight without re-introducing overflow risk
            logits = jnp.where(kv_mask[:, None, None, :] > 0, logits, -200.0)
        e = jnp.exp(logits)
        weights = e / jnp.sum(e, axis=-1, keepdims=True)
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v)
