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
intermediates instead of per-layer appends. Because the cross-attention
memory and its positional embedding are IDENTICAL for every layer, the
decoder hoists `memory + pos` out of the layer loop (the reference re-adds it
inside every layer, transformer.py:262-270); each layer still projects its
own K/V. (A stacked all-layers K/V einsum was measured SLOWER on v5e: it
materialises 2.7 GB of K/V at once and defeats XLA's projection-into-
attention fusion.)"""
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

    def setup(self):
        self.self_attn = MultiHeadAttention(
            self.d_model, self.heads, dtype=self.dtype,
            attn_impl=self.attn_impl,
        )
        self.cross_attn = MultiHeadAttention(
            self.d_model, self.heads, dtype=self.dtype,
            attn_impl=self.attn_impl,
        )
        self.norm1 = LayerNorm32()
        self.norm2 = LayerNorm32()
        self.norm3 = LayerNorm32()
        self.linear1 = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                                param_dtype=jnp.float32)
        self.linear2 = nn.Dense(self.d_model, dtype=self.dtype,
                                param_dtype=jnp.float32)

    def __call__(
        self,
        tgt: jnp.ndarray,  # [b, q, d]
        mem_pos: jnp.ndarray,  # [b, s, d] memory + pos (hoisted, shared)
        memory: jnp.ndarray,  # [b, s, d]
        query_pos: Optional[jnp.ndarray],  # [b, q, d]
        memory_mask: Optional[jnp.ndarray] = None,  # [b, s] valid-key mask
        memory_bias: Optional[jnp.ndarray] = None,  # additive [b,1,1,s]
    ) -> jnp.ndarray:
        def add(t, p):
            return t if p is None else t + p

        q = add(tgt, query_pos)
        tgt = tgt + self.self_attn(q, q, tgt)
        tgt = self.norm1(tgt)

        tgt = tgt + self.cross_attn.attend_kv(
            add(tgt, query_pos),
            self.cross_attn.k_proj(mem_pos, self.dtype),
            self.cross_attn.v_proj(memory, self.dtype),
            kv_mask=memory_mask,
            bias=memory_bias,
        )
        tgt = self.norm2(tgt)

        y = self.linear1(tgt)
        y = nn.relu(y)
        y = self.linear2(y)
        tgt = tgt + y
        tgt = self.norm3(tgt)
        return tgt


class QueryDecoder(nn.Module):
    d_model: int
    heads: int = 8
    num_layers: int = 6
    dim_feedforward: int = 2048
    return_intermediate: bool = True
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    def setup(self):
        self.layers = [
            DecoderLayer(
                self.d_model, self.heads, self.dim_feedforward,
                dtype=self.dtype, attn_impl=self.attn_impl,
            )
            for _ in range(self.num_layers)
        ]
        self.norm = LayerNorm32()

    def __call__(
        self,
        tgt: jnp.ndarray,
        memory: jnp.ndarray,
        pos: Optional[jnp.ndarray] = None,
        query_pos: Optional[jnp.ndarray] = None,
        memory_mask: Optional[jnp.ndarray] = None,
        memory_bias: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Returns [n_layers, b, q, d] if return_intermediate else [1, b, q, d];
        every slice is passed through the shared final norm.

        `memory_bias` is an additive attention bias broadcast to
        [b, h, q, s] — the pooled padded path passes log(valid-count) per
        pooled key so partial boundary cells attract softmax mass
        proportional to their valid-token count (models/zutis.py
        forward_padded decoder_pool)."""
        mem_pos = memory if pos is None else memory + pos
        outputs = []
        x = tgt
        for layer in self.layers:
            x = layer(x, mem_pos, memory, query_pos,
                      memory_mask=memory_mask, memory_bias=memory_bias)
            if self.return_intermediate:
                outputs.append(x)
        if not self.return_intermediate:
            outputs = [x]
        stacked = jnp.stack(outputs, axis=0)  # [L, b, q, d]
        return self.norm(stacked)
