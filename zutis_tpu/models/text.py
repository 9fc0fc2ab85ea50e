"""CLIP text encoder (frozen at runtime; used once to build category/text
embeddings — reference networks/clip_arch.py:534-547 `encode_text`).

Token embedding + learned positional embedding -> causal pre-LN transformer
with QuickGELU MLPs -> ln_final -> take the EOT token (argmax position, the
highest token id in CLIP's vocab) -> text_projection."""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from zutis_tpu.models.layers import LayerNorm32
from zutis_tpu.models.vit import ResidualAttentionBlock


class CLIPTextEncoder(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text: jnp.ndarray) -> jnp.ndarray:
        """text: [b, context_length] int32 token ids -> [b, embed_dim]."""
        tok_embed = nn.Embed(
            self.vocab_size, self.width, dtype=self.dtype,
            param_dtype=jnp.float32, name="token_embedding",
        )
        pos_embed = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = tok_embed(text) + pos_embed.astype(self.dtype)[None]

        causal = np.full(
            (self.context_length, self.context_length), -np.inf, np.float32
        )
        causal = np.triu(causal, k=1)[None, None]  # [1,1,s,s]
        bias = jnp.asarray(causal)

        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, dtype=self.dtype, name=f"resblocks_{i}",
            )(x, bias=bias)
        x = LayerNorm32(name="ln_final")(x)

        text_proj = self.param(
            "text_projection", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim),
        )
        eot = jnp.argmax(text, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        return pooled @ text_proj.astype(self.dtype)
