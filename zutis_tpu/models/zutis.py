"""The ZUTIS network: CLIP ViT encoder + query transformer decoder emitting
per-query mask proposals and text-space dense patch tokens.

Behavioural contract (reference networks/zutis.py:472-532 `forward`):
  1. encoder -> patch tokens [b, hw, width]
  2. bilinear x2 upsample of the token grid (zutis.py:488-497)
  3. ffn1(stop_gradient(tokens)) -> decoder memory (zutis.py:500-503)
  4. sine positional embedding over the upsampled grid (zutis.py:507)
  5. 6-layer query decoder, tgt=0, query_pos = 100 learned N(0,1) queries,
     all-layer outputs (zutis.py:510-513)
  6. ffn2(queries), L2-normalise (zutis.py:514-515)
  7. mask_proposals = sigmoid(queries . memory) per layer (zutis.py:522-526)
  8. dense text-space tokens: tokens @ visual.proj, parameter-free LayerNorm
     over the whole (h, w, c) map, L2-normalise with eps 1e-7
     (zutis.py:301-331, 528-530)

Returns {"mask_proposals": [b, L, Q, h, w], "patch_tokens": [b, h, w, text_dim]}.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from zutis_tpu.models.decoder import QueryDecoder
from zutis_tpu.models.layers import MLP
from zutis_tpu.models.pos_embed import sine_pos_embed
from zutis_tpu.models.vit import CLIPViT
from zutis_tpu.ops.resize import interpolate


def full_map_layer_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Parameter-free LayerNorm over all non-batch axes (the reference
    normalises the entire (h, w, c) feature map jointly, zutis.py:321)."""
    axes = tuple(range(1, x.ndim))
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.var(x32, axis=axes, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class ZUTIS(nn.Module):
    # encoder (ViT-B/16 defaults; ViT-B/32 via patch_size=32)
    width: int = 768
    encoder_layers: int = 12
    encoder_heads: int = 12
    patch_size: int = 16
    text_dim: int = 512
    input_resolution: int = 224
    # decoder head
    n_queries: int = 100
    n_decoder_layers: int = 6
    n_heads: int = 8
    stop_gradient: bool = True
    upsample_tokens: bool = True  # ViT / non-dilated RN: x2 token upsample
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    def setup(self):
        self.encoder = CLIPViT(
            width=self.width,
            layers=self.encoder_layers,
            heads=self.encoder_heads,
            patch_size=self.patch_size,
            output_dim=self.text_dim,
            input_resolution=self.input_resolution,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="encoder",
        )
        self.ffn1 = MLP(256, self.width, 3, dtype=self.dtype, name="ffn1")
        self.ffn2 = MLP(256, self.width, 3, dtype=self.dtype, name="ffn2")
        self.decoder = QueryDecoder(
            d_model=self.width,
            heads=self.n_heads,
            num_layers=self.n_decoder_layers,
            return_intermediate=True,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="decoder",
        )
        # learned object queries, N(0, 1) like nn.Embedding's default
        # (reference networks/zutis.py:130-133)
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.n_queries, self.width),
        )

    def __call__(
        self, x: jnp.ndarray, inference: bool = False
    ) -> Dict[str, jnp.ndarray]:
        """inference=True computes mask proposals for the LAST decoder layer
        only — prediction uses just that layer (reference zutis.py:379-382),
        so the other 5 sigmoid einsums are training-only work."""
        b = x.shape[0]
        patch_tokens, h_feat, w_feat = self.encoder(x)

        if self.upsample_tokens:
            grid = patch_tokens.reshape(b, h_feat, w_feat, self.width)
            grid = grid.transpose(0, 3, 1, 2)
            grid = interpolate(grid, scale_factor=2, mode="bilinear")
            h_feat, w_feat = h_feat * 2, w_feat * 2
            patch_tokens = grid.transpose(0, 2, 3, 1).reshape(b, -1, self.width)

        tokens_in = (
            jax.lax.stop_gradient(patch_tokens)
            if self.stop_gradient else patch_tokens
        )
        memory = self.ffn1(tokens_in)  # [b, hw, width]

        pos = sine_pos_embed(h_feat, w_feat, self.width // 2)  # [width,h,w]
        pos = jnp.asarray(pos.reshape(self.width, -1).T)[None]  # [1, hw, width]
        pos = jnp.broadcast_to(pos, memory.shape).astype(self.dtype)

        query_pos = jnp.broadcast_to(
            self.query_embed.astype(self.dtype)[None],
            (b, self.n_queries, self.width),
        )
        tgt = jnp.zeros_like(query_pos)

        queries = self.decoder(tgt, memory, pos=pos, query_pos=query_pos)
        if inference:
            queries = queries[-1:]  # last decoder layer only
        queries = queries.transpose(1, 0, 2, 3)  # [b, L, Q, d]
        queries = self.ffn2(queries)
        queries = queries / jnp.linalg.norm(queries, axis=-1, keepdims=True)

        memory_grid = memory.reshape(b, h_feat, w_feat, self.width)
        logits = jnp.einsum(
            "blqc,bhwc->blqhw", queries, memory_grid,
            preferred_element_type=jnp.float32,
        )
        mask_proposals = nn.sigmoid(logits)

        proj = self.encoder.proj
        text_tokens = jnp.einsum(
            "bhwn,nc->bhwc",
            patch_tokens.reshape(b, h_feat, w_feat, self.width),
            proj.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        text_tokens = full_map_layer_norm(text_tokens)
        text_tokens = text_tokens / (
            jnp.linalg.norm(text_tokens, axis=-1, keepdims=True) + 1e-7
        )
        return {
            "mask_proposals": mask_proposals.astype(jnp.float32),
            "patch_tokens": text_tokens.astype(jnp.float32),
        }
