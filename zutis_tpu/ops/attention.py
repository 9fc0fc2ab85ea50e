"""Multi-head attention core.

One entry point, `dot_product_attention`, with selectable implementations:
  - "xla":    jnp einsum softmax attention (XLA fuses this well on TPU).
  - "pallas": fused FlashAttention-style Pallas kernel for long sequences
              (dense high-res inference; see ops/flash_attention.py).

Softmax statistics always accumulate in float32 regardless of the compute
dtype (bf16 activations on TPU).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jnp.ndarray,  # [b, h, sq, d]
    k: jnp.ndarray,  # [b, h, sk, d]
    v: jnp.ndarray,  # [b, h, sk, d]
    bias: jnp.ndarray | None = None,  # broadcastable to [b, h, sq, sk]
    impl: str = "xla",
) -> jnp.ndarray:
    if impl == "pallas":
        from zutis_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, bias=bias)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v)
