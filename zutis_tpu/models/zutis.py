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

from typing import Tuple

from zutis_tpu.models.decoder import QueryDecoder
from zutis_tpu.models.layers import MLP
from zutis_tpu.models.pos_embed import sine_pos_embed
from zutis_tpu.models.resnet import ModifiedResNet
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


def masked_full_map_layer_norm(
    x: jnp.ndarray,  # [b, h, w, c]
    valid: jnp.ndarray,  # [b, h, w] 1 inside each sample's native window
    eps: float = 1e-5,
) -> jnp.ndarray:
    """`full_map_layer_norm` whose statistics cover only each sample's valid
    window — makes the padded batched program equal the per-image program on
    that window. Outputs at invalid positions are meaningless."""
    x32 = x.astype(jnp.float32)
    m = valid.astype(jnp.float32)[..., None]
    count = jnp.sum(m, axis=(1, 2, 3), keepdims=True) * x.shape[-1]
    mean = jnp.sum(x32 * m, axis=(1, 2, 3), keepdims=True) / count
    var = jnp.sum(jnp.square(x32 - mean) * m, axis=(1, 2, 3),
                  keepdims=True) / count
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _l2_normalize_queries(queries: jnp.ndarray) -> jnp.ndarray:
    """The reference divides by the raw norm with NO eps (zutis.py:515);
    statistics run in f32 (bf16 squares underflow), and an exact-zero query
    — possible when both ReLU hiddens of ffn2 die for a query — maps to the
    zero vector instead of the reference's NaN (the only case where the two
    differ)."""
    q32 = queries.astype(jnp.float32)
    norm = jnp.linalg.norm(q32, axis=-1, keepdims=True)
    return (q32 / jnp.maximum(norm, 1e-30)).astype(queries.dtype)


class ZUTIS(nn.Module):
    # encoder family: "vit" (CLIP ViT), "rn" (CLIP ModifiedResNet) or
    # "dino" (DINO ViT-B/16, the reference's encoder_type="dino" comparison
    # arm, networks/zutis.py:73-100).
    # For "rn", `width` is the stage-4 embed dim (rn_width * 32, e.g. 2048
    # for RN50) — it feeds ffn1/ffn2 and the decoder exactly as the
    # reference's `self.encoder.width` does (networks/zutis.py:59-71).
    # For "dino", patch tokens pass through `vision_to_text_ffn` into the
    # text dimension BEFORE the upsample (networks/zutis.py:482-486), so
    # `width` == text_dim and the raw encoder dim is `dino_embed_dim`.
    encoder_family: str = "vit"
    # encoder (ViT-B/16 defaults; ViT-B/32 via patch_size=32)
    width: int = 768
    encoder_layers: int = 12
    encoder_heads: int = 12
    patch_size: int = 16
    text_dim: int = 512
    input_resolution: int = 224
    # RN-family geometry (used when encoder_family == "rn")
    rn_layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    rn_width: int = 64
    # DINO-family geometry (used when encoder_family == "dino")
    dino_embed_dim: int = 768
    dino_depth: int = 12
    dino_heads: int = 12
    # decoder head
    n_queries: int = 100
    n_decoder_layers: int = 6
    n_heads: int = 8
    stop_gradient: bool = True
    upsample_tokens: bool = True  # ViT / non-dilated RN: x2 token upsample
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    # opt-in encoder token merging (ops/tome.py; ViT family) — tokens
    # merged per encoder block; 0 = exact original program. On the padded
    # batched path, padding tokens merge with zero weight (free removals),
    # so valid outputs are invariant to padding content.
    tome_r: int = 0
    # opt-in decoder-memory pooling (dense and padded paths): cross-
    # attention reads a p x p average-pooled memory grid (memory AND sine
    # pos pooled identically) while the mask-proposal einsum keeps the
    # DENSE memory, so proposals stay full-resolution. Pooling is
    # mathematically exact when each cell's tokens are identical (uniform
    # cell sizes cancel in softmax; partial boundary cells on the padded
    # path carry a +log(valid-count) bias for the same identity); the
    # real-image cost is measured, not assumed (PERF.md round-5 decoder-
    # memory table). Targets the ~20 ms/iter of decoder K/V projection +
    # cross-attention over the x2-upsampled 2304-token memory that ToMe
    # does not touch (reference networks/zutis.py:488-513 hot path).
    # 1 = exact original program.
    decoder_pool: int = 1

    def setup(self):
        assert self.tome_r == 0 or self.encoder_family == "vit", (
            "ToMe token merging is implemented for the CLIP ViT encoder "
            "family only"
        )
        assert self.decoder_pool >= 1, self.decoder_pool
        if self.encoder_family == "rn":
            assert self.width == self.rn_width * 32, (
                "RN encoders feed the decoder at their stage-4 embed dim: "
                f"width must be rn_width*32={self.rn_width * 32}, "
                f"got {self.width}"
            )
            self.encoder = ModifiedResNet(
                layers=self.rn_layers,
                width=self.rn_width,
                output_dim=self.text_dim,
                heads=self.rn_width * 32 // 64,
                input_resolution=self.input_resolution,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name="encoder",
            )
        elif self.encoder_family == "dino":
            from zutis_tpu.models.selfmask import DeiTEncoder

            assert self.width == self.text_dim, (
                "DINO family: vision_to_text_ffn maps tokens into the text "
                "dim before the decoder (reference networks/zutis.py:482-486)"
                f"; width must equal text_dim={self.text_dim}"
            )
            self.encoder = DeiTEncoder(
                embed_dim=self.dino_embed_dim,
                depth=self.dino_depth,
                heads=self.dino_heads,
                patch_size=self.patch_size,
                base_grid=self.input_resolution // self.patch_size,
                dtype=self.dtype,
                name="encoder",
            )
            self.vision_to_text_ffn = MLP(
                256, self.text_dim, 3, dtype=self.dtype,
                name="vision_to_text_ffn",
            )
        else:
            self.encoder = CLIPViT(
                width=self.width,
                layers=self.encoder_layers,
                heads=self.encoder_heads,
                patch_size=self.patch_size,
                output_dim=self.text_dim,
                input_resolution=self.input_resolution,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                tome_r=self.tome_r,
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
        if self.encoder_family == "dino":
            # DeiTEncoder returns CLS-prefixed tokens; bridge into the text
            # dim before everything downstream (reference zutis.py:482-486)
            patch_tokens = self.vision_to_text_ffn(patch_tokens[:, 1:, :])

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

        if self.decoder_pool > 1:
            p = self.decoder_pool
            assert h_feat % p == 0 and w_feat % p == 0, (
                f"decoder_pool={p} must divide the (post-upsample) token "
                f"grid {h_feat}x{w_feat}"
            )

            def _pool(t):
                g = t.reshape(b, h_feat // p, p, w_feat // p, p, self.width)
                g = jnp.mean(g.astype(jnp.float32), axis=(2, 4))
                return g.astype(t.dtype).reshape(b, -1, self.width)

            mem_att, pos_att = _pool(memory), _pool(pos)
        else:
            mem_att, pos_att = memory, pos

        queries = self.decoder(tgt, mem_att, pos=pos_att, query_pos=query_pos)
        if inference:
            queries = queries[-1:]  # last decoder layer only
        queries = queries.transpose(1, 0, 2, 3)  # [b, L, Q, d]
        queries = self.ffn2(queries)
        queries = _l2_normalize_queries(queries)

        memory_grid = memory.reshape(b, h_feat, w_feat, self.width)
        logits = jnp.einsum(
            "blqc,bhwc->blqhw", queries, memory_grid,
            preferred_element_type=jnp.float32,
        )
        mask_proposals = nn.sigmoid(logits)

        token_grid = patch_tokens.reshape(b, h_feat, w_feat, self.width)
        if self.encoder_family == "rn":
            # RN family: the reference projects to text space by running the
            # (possibly upsampled) grid through AttentionPool2d and dropping
            # the mean token (networks/zutis.py:309-316).
            text_tokens = self.encoder.attnpool_tokens(token_grid).astype(
                jnp.float32
            )
        elif self.encoder_family == "dino":
            # tokens are already in the text dim via vision_to_text_ffn; the
            # reference would pass `self.encoder.proj` here, an attribute
            # DINO ViTs do not have (its dino arm crashes at
            # networks/zutis.py:529) — the evident intent is no projection
            text_tokens = token_grid.astype(jnp.float32)
        else:
            text_tokens = jnp.einsum(
                "bhwn,nc->bhwc",
                token_grid,
                self.encoder.proj.astype(self.dtype),
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

    def forward_padded(
        self,
        x: jnp.ndarray,  # [b, 3, H_pad, W_pad]
        native_grid: jnp.ndarray,  # [b, 2] native token grids (H//p, W//p)
        inference: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Batched variable-resolution forward for the bucketed evaluator
        (engine/batched_eval.py). One static program per bucket shape; each
        sample's valid output window equals (up to fp reassociation) what
        `__call__` computes at that sample's native resolution:

          - encoder: per-sample pos-emb interpolation + key-masked attention
            (models/vit.py:forward_padded); exact because ViT patches are
            non-overlapping, so padding pixels never reach valid tokens.
          - the x2 token upsample sees an edge-replicated grid
            (ops/dynamic_shapes.py:replicate_edges), reproducing the native
            program's clamped border taps.
          - decoder memory: per-sample sine pos-emb normalised by the native
            extent + memory key mask.
          - text-space projection: masked full-map LayerNorm.

        ViT-family only — RN convolutions are overlapping, so padding leaks
        into boundary features; the evaluator falls back to per-image eval
        for RN architectures.

        Returns forward outputs plus "valid" [b, h, w] and "native_grid"
        [b, 2] (post-upsample) for downstream decode."""
        assert self.encoder_family == "vit", (
            "forward_padded is implemented for the CLIP ViT family; RN "
            "(overlapping convs) and DINO models evaluate per-image"
        )
        from zutis_tpu.ops.dynamic_shapes import (
            replicate_edges,
            sine_pos_embed_dynamic,
            token_valid_mask,
        )

        b = x.shape[0]
        patch_tokens, _ = self.encoder.forward_padded(x, native_grid)
        hp = x.shape[-2] // self.patch_size
        wp = x.shape[-1] // self.patch_size

        grid = patch_tokens.reshape(b, hp, wp, self.width)
        grid = replicate_edges(grid, native_grid)
        if self.upsample_tokens:
            nchw = grid.transpose(0, 3, 1, 2)
            nchw = interpolate(nchw, scale_factor=2, mode="bilinear")
            grid = nchw.transpose(0, 2, 3, 1)
            hp, wp = hp * 2, wp * 2
            native_grid = native_grid * 2
        patch_tokens = grid.reshape(b, hp * wp, self.width)
        valid = token_valid_mask(native_grid, hp, wp)  # [b, hp*wp]

        tokens_in = (
            jax.lax.stop_gradient(patch_tokens)
            if self.stop_gradient else patch_tokens
        )
        memory = self.ffn1(tokens_in)

        pos = sine_pos_embed_dynamic(
            hp, wp, self.width // 2, native_grid
        ).astype(self.dtype)

        query_pos = jnp.broadcast_to(
            self.query_embed.astype(self.dtype)[None],
            (b, self.n_queries, self.width),
        )
        tgt = jnp.zeros_like(query_pos)
        if self.decoder_pool > 1:
            # Validity-weighted pooling: each pooled key averages only the
            # VALID tokens in its p x p cell and carries a +log(count)
            # attention bias, so a cell of c identical valid tokens attracts
            # exactly c dense tokens' softmax mass (the ToMe proportional-
            # attention identity, ops/tome.py; exactness pinned in
            # tests/test_decoder_pool.py). Cells with no valid token are
            # masked out. Cell alignment follows the PADDED grid origin, so
            # this is the pooled program's own contract — a native-grid
            # run at a non-divisible resolution has no pooled counterpart.
            p = self.decoder_pool
            assert hp % p == 0 and wp % p == 0, (
                f"decoder_pool={p} must divide the bucket token grid "
                f"{hp}x{wp}"
            )
            v32 = valid.reshape(b, hp // p, p, wp // p, p).astype(jnp.float32)
            count = jnp.sum(v32, axis=(2, 4))  # [b, hp/p, wp/p]
            denom = jnp.maximum(count, 1.0)[..., None]

            def _pool_valid(t):
                g = t.reshape(b, hp // p, p, wp // p, p, self.width)
                g = g.astype(jnp.float32) * v32[..., None]
                s = jnp.sum(g, axis=(2, 4)) / denom
                return s.astype(t.dtype).reshape(b, -1, self.width)

            queries = self.decoder(
                tgt, _pool_valid(memory), pos=_pool_valid(pos),
                query_pos=query_pos,
                memory_mask=(count > 0).reshape(b, -1),
                memory_bias=jnp.log(jnp.maximum(count, 1.0)).reshape(
                    b, 1, 1, -1),
            )
        else:
            queries = self.decoder(
                tgt, memory, pos=pos, query_pos=query_pos, memory_mask=valid
            )
        if inference:
            queries = queries[-1:]
        queries = queries.transpose(1, 0, 2, 3)
        queries = self.ffn2(queries)
        queries = _l2_normalize_queries(queries)

        memory_grid = memory.reshape(b, hp, wp, self.width)
        logits = jnp.einsum(
            "blqc,bhwc->blqhw", queries, memory_grid,
            preferred_element_type=jnp.float32,
        )
        mask_proposals = nn.sigmoid(logits)

        token_grid = patch_tokens.reshape(b, hp, wp, self.width)
        text_tokens = jnp.einsum(
            "bhwn,nc->bhwc", token_grid, self.encoder.proj.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        valid_grid = valid.reshape(b, hp, wp)
        text_tokens = masked_full_map_layer_norm(text_tokens, valid_grid)
        text_tokens = text_tokens / (
            jnp.linalg.norm(text_tokens, axis=-1, keepdims=True) + 1e-7
        )
        return {
            "mask_proposals": mask_proposals.astype(jnp.float32),
            "patch_tokens": text_tokens.astype(jnp.float32),
            "valid": valid_grid,
            "native_grid": native_grid,
        }
