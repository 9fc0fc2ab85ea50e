"""DETR/MaskFormer-style query transformer decoder (post-norm).

Behavioural contract (reference networks/transformer.py:106-152, 231-291):
each layer runs self-attention over queries (q = k = tgt + query_pos,
v = tgt), then cross-attention into the image memory (q = tgt + query_pos,
k = memory + pos, v = memory), then a ReLU FFN; LayerNorm after each residual.
With `return_intermediate` the decoder emits every layer's output passed
through one shared final LayerNorm, stacked as [n_layers, b, q, d] (the last
entry is exactly the final normed output, transformer.py:143-147).

TPU-first: batch-first layouts, lax.scan-free static unroll over the 6 layers
(XLA pipelines them), shared-norm application vectorised over the stacked
intermediates instead of per-layer appends."""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from zutis_tpu.models.layers import LayerNorm32, MultiHeadAttention


class DecoderLayer(nn.Module):
    d_model: int
    heads: int
    dim_feedforward: int = 2048
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,  # [b, q, d]
        memory: jnp.ndarray,  # [b, s, d]
        pos: Optional[jnp.ndarray],  # [b, s, d]
        query_pos: Optional[jnp.ndarray],  # [b, q, d]
        memory_mask: Optional[jnp.ndarray] = None,  # [b, s] valid-key mask
    ) -> jnp.ndarray:
        def add(t, p):
            return t if p is None else t + p

        q = k = add(tgt, query_pos)
        tgt = tgt + MultiHeadAttention(
            self.d_model, self.heads, dtype=self.dtype,
            attn_impl=self.attn_impl, name="self_attn",
        )(q, k, tgt)
        tgt = LayerNorm32(name="norm1")(tgt)

        tgt = tgt + MultiHeadAttention(
            self.d_model, self.heads, dtype=self.dtype,
            attn_impl=self.attn_impl, name="cross_attn",
        )(add(tgt, query_pos), add(memory, pos), memory,
          kv_mask=memory_mask)
        tgt = LayerNorm32(name="norm2")(tgt)

        y = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                     param_dtype=jnp.float32, name="linear1")(tgt)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, dtype=self.dtype,
                     param_dtype=jnp.float32, name="linear2")(y)
        tgt = tgt + y
        tgt = LayerNorm32(name="norm3")(tgt)
        return tgt


class QueryDecoder(nn.Module):
    d_model: int
    heads: int = 8
    num_layers: int = 6
    dim_feedforward: int = 2048
    return_intermediate: bool = True
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,
        memory: jnp.ndarray,
        pos: Optional[jnp.ndarray] = None,
        query_pos: Optional[jnp.ndarray] = None,
        memory_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Returns [n_layers, b, q, d] if return_intermediate else [1, b, q, d];
        every slice is passed through the shared final norm."""
        norm = LayerNorm32(name="norm")
        outputs = []
        x = tgt
        for i in range(self.num_layers):
            x = DecoderLayer(
                self.d_model, self.heads, self.dim_feedforward,
                dtype=self.dtype, attn_impl=self.attn_impl, name=f"layers_{i}",
            )(x, memory, pos, query_pos, memory_mask=memory_mask)
            if self.return_intermediate:
                outputs.append(x)
        if not self.return_intermediate:
            outputs = [x]
        stacked = jnp.stack(outputs, axis=0)  # [L, b, q, d]
        return norm(stacked)
