"""Shared building blocks: multi-head attention, MLPs, QuickGELU.

Parameters are stored as flax Dense kernels ([in, out]); the weight converter
(models/weights.py) transposes torch layouts on import. Compute dtype is
configurable (bf16 on TPU), parameters stay float32, layer norms and softmax
statistics run in float32.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from zutis_tpu.ops.attention import dot_product_attention


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's GELU approximation x * sigmoid(1.702 x)
    (reference networks/clip_arch.py:295-297)."""
    return x * nn.sigmoid(1.702 * x)


class LayerNorm32(nn.Module):
    """LayerNorm computed in float32, output cast back to input dtype."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = x.dtype
        y = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return y.astype(dtype)


class MultiHeadAttention(nn.Module):
    """Torch-`nn.MultiheadAttention`-compatible MHA (separate q/k/v inputs for
    cross-attention; combined scaling conventions identical)."""

    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    out_dim: Optional[int] = None  # output projection dim (defaults to dim)

    @nn.compact
    def __call__(
        self,
        q_in: jnp.ndarray,  # [b, sq, dim]
        k_in: jnp.ndarray,  # [b, sk, dim]
        v_in: jnp.ndarray,  # [b, sk, dim]
        bias: Optional[jnp.ndarray] = None,  # additive, broadcast to [b,h,sq,sk]
        kv_mask: Optional[jnp.ndarray] = None,  # [b, sk] valid-key mask
    ) -> jnp.ndarray:
        d = self.dim
        hd = d // self.heads
        dense = lambda name: nn.Dense(  # noqa: E731
            d, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = dense("q_proj")(q_in)
        k = dense("k_proj")(k_in)
        v = dense("v_proj")(v_in)

        def split(x):
            b, s, _ = x.shape
            return x.reshape(b, s, self.heads, hd).transpose(0, 2, 1, 3)

        out = dot_product_attention(
            split(q), split(k), split(v), bias=bias, kv_mask=kv_mask,
            impl=self.attn_impl,
        )
        b, _, sq, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, sq, d)
        return nn.Dense(
            self.out_dim if self.out_dim is not None else d,
            dtype=self.dtype, param_dtype=jnp.float32, name="out_proj",
        )(out)


class MLP(nn.Module):
    """N-layer perceptron with ReLU between layers (reference
    networks/zutis.py:535-549: ffn1/ffn2 are width->256->256->width)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x
