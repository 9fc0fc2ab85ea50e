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

from zutis_tpu.ops.attention import dot_product_attention_bshd


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


class DenseParams(nn.Module):
    """Eager `nn.Dense`-layout parameter holder: identical param paths
    (<name>/kernel, <name>/bias) and initialisers, but the kernel/bias are
    plain attributes readable by parent modules — which lets them FUSE
    projections (QKV concat, multi-layer K/V stacks) into single MXU matmuls
    instead of one dot per projection."""

    features_in: int
    features_out: int

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.features_in, self.features_out),
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features_out,)
        )

    def __call__(self, x: jnp.ndarray, dtype: jnp.dtype) -> jnp.ndarray:
        return x.astype(dtype) @ self.kernel.astype(dtype) + self.bias.astype(
            dtype
        )


class MultiHeadAttention(nn.Module):
    """Torch-`nn.MultiheadAttention`-compatible MHA (separate q/k/v inputs for
    cross-attention; combined scaling conventions identical).

    TPU notes: q/k/v projections stay SEPARATE dots — a concat-weights fused
    QKV was measured slower on v5e (the [b, s, 3d] product + split defeats
    XLA's transpose-into-dot fusion; encoder 69 -> 77 ms at batch 64).
    `attend_kv` accepts externally projected k/v so QueryDecoder can hoist
    loop-invariant work out of its layer loop."""

    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    out_dim: Optional[int] = None  # output projection dim (defaults to dim)

    def setup(self):
        d = self.dim
        self.q_proj = DenseParams(d, d)
        self.k_proj = DenseParams(d, d)
        self.v_proj = DenseParams(d, d)
        self.out_proj = DenseParams(
            d, self.out_dim if self.out_dim is not None else d
        )

    def _split(self, x: jnp.ndarray) -> jnp.ndarray:
        # head split WITHOUT transpose: [b, s, h, hd] is a free reshape, and
        # dot_product_attention_bshd keeps that layout end-to-end
        b, s, _ = x.shape
        return x.reshape(b, s, self.heads, self.dim // self.heads)

    def _finish(self, out: jnp.ndarray) -> jnp.ndarray:
        b, sq = out.shape[:2]
        return self.out_proj(out.reshape(b, sq, self.dim), self.dtype)

    def __call__(
        self,
        q_in: jnp.ndarray,  # [b, sq, dim]
        k_in: jnp.ndarray,  # [b, sk, dim]
        v_in: jnp.ndarray,  # [b, sk, dim]
        bias: Optional[jnp.ndarray] = None,  # additive, broadcast to [b,h,sq,sk]
        kv_mask: Optional[jnp.ndarray] = None,  # [b, sk] valid-key mask
        return_k: bool = False,  # also return head-mean keys (ToMe metric)
    ) -> jnp.ndarray:
        dt = self.dtype
        q = self.q_proj(q_in, dt)
        k = self.k_proj(k_in, dt)
        v = self.v_proj(v_in, dt)
        out = dot_product_attention_bshd(
            self._split(q), self._split(k), self._split(v), bias=bias,
            kv_mask=kv_mask, impl=self.attn_impl,
        )
        if return_k:
            # head-averaged keys: the token-similarity metric ToMe merges on
            # (ops/tome.py) — reuses this layer's already-projected k
            return self._finish(out), self._split(k).mean(axis=2)
        return self._finish(out)

    def attend_kv(
        self,
        q_in: jnp.ndarray,  # [b, sq, dim]
        k: jnp.ndarray,  # [b, sk, dim] ALREADY projected by this layer's k_proj
        v: jnp.ndarray,  # [b, sk, dim] ALREADY projected by this layer's v_proj
        kv_mask: Optional[jnp.ndarray] = None,
        bias: Optional[jnp.ndarray] = None,  # additive, broadcast [b,h,sq,sk]
    ) -> jnp.ndarray:
        q = self.q_proj(q_in, self.dtype)
        out = dot_product_attention_bshd(
            self._split(q), self._split(k), self._split(v), bias=bias,
            kv_mask=kv_mask, impl=self.attn_impl,
        )
        return self._finish(out)


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
