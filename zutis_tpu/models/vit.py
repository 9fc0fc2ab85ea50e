"""CLIP Vision Transformer encoder returning dense patch tokens.

Behavioural contract (reference networks/clip_arch.py:335-411): patchify conv
(no bias) -> prepend class token -> add bicubically-interpolated positional
embedding (computed with the reference's `+0.1` scale-factor fudge,
clip_arch.py:357-374) -> ln_pre -> `layers` pre-LN residual attention blocks
with QuickGELU MLPs -> drop CLS -> ln_post over patch tokens. The text-space
projection `proj` is a parameter of this module but NOT applied in
`__call__`; ZUTIS applies it separately (networks/zutis.py:528-530).
`encode_image` provides the original CLIP pooled embedding (CLS @ proj) used
by the retrieval pipeline (reference utils/extract_image_embeddings.py).

TPU-first notes: batch-first [b, s, d] layout throughout (no torch seq-first
permutes); attention runs through ops/attention.py (swap-in Pallas flash
kernel); pos-emb interpolation is an MXU matmul (ops/resize.py)."""
from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from zutis_tpu.models.layers import LayerNorm32, MultiHeadAttention, quick_gelu
from zutis_tpu.ops.resize import resize_2d


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias=None, kv_mask=None,
                 tome_r: int = 0, size=None):
        """Standard pre-LN block. With tome_r > 0 (and `size` the [b, s]
        token sizes), r tokens are merged between the attention and the MLP
        (ops/tome.py) and the return value becomes
        (x [b, s-r, d], size [b, s-r], mapping [b, s]) — the opt-in
        token-reduction path; tome_r=0 is byte-identical to the original
        program."""
        y = LayerNorm32(name="ln_1")(x)
        attn = MultiHeadAttention(
            self.width, self.heads, dtype=self.dtype, attn_impl=self.attn_impl,
            name="attn",
        )
        if tome_r <= 0:
            x = x + attn(y, y, y, bias=bias, kv_mask=kv_mask)
            mapping = None
        else:
            from zutis_tpu.ops.tome import proportional_attn_bias, tome_merge

            prop = proportional_attn_bias(size)
            attn_out, k_mean = attn(
                y, y, y, bias=prop if bias is None else prop + bias,
                kv_mask=kv_mask, return_k=True)
            x = x + attn_out
            x, size, mapping = tome_merge(x, k_mean, size, tome_r)
        y = LayerNorm32(name="ln_2")(x)
        y = nn.Dense(self.width * 4, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_c_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_c_proj")(y)
        x = x + y
        if tome_r > 0:
            return x, size, mapping
        return x


def interpolate_pos_embed(
    pos_embed: jnp.ndarray,  # [1 + g*g, width]
    size: Tuple[int, int],
) -> jnp.ndarray:
    """Bicubic interpolation of the patch positional embedding to an arbitrary
    (h, w) grid, exactly matching the reference (clip_arch.py:357-374): the
    scale factor carries a +0.1 fudge that slightly shifts sample coordinates
    under torch's scale_factor code path."""
    h, w = size
    cls_pe, patch_pe = pos_embed[:1], pos_embed[1:]
    hw, n_dims = patch_pe.shape
    g = int(math.sqrt(hw))
    # No identity shortcut even at the native grid: the reference resamples
    # unconditionally, and the +0.1 fudge makes that a non-identity map.
    grid = patch_pe.reshape(g, g, n_dims).transpose(2, 0, 1)  # [d, g, g]
    scale_h = (h + 0.1) / g
    scale_w = (w + 0.1) / g
    grid = resize_2d(grid, (h, w), mode="cubic",
                     scales=(1.0 / scale_h, 1.0 / scale_w))
    patch_pe = grid.transpose(1, 2, 0).reshape(h * w, n_dims)
    return jnp.concatenate([cls_pe, patch_pe], axis=0)


def interpolate_pos_embed_exact(
    pos_embed: jnp.ndarray,  # [1 + g*g, width]
    size: Tuple[int, int],
) -> jnp.ndarray:
    """The SelfMask ViT's variant (reference networks/selfmask/
    vision_transformer.py:377-401): IDENTITY when the grid matches the
    stored embedding, otherwise F.interpolate(size=(h, w), bicubic,
    align_corners=False) — the exact-size code path, with NO +0.1
    scale-factor fudge (that fudge belongs to the CLIP tower only,
    clip_arch.py:357-374; the two references interpolate differently)."""
    h, w = size
    cls_pe, patch_pe = pos_embed[:1], pos_embed[1:]
    hw, n_dims = patch_pe.shape
    g = int(math.sqrt(hw))
    if (h, w) == (g, g):
        return pos_embed
    grid = patch_pe.reshape(g, g, n_dims).transpose(2, 0, 1)  # [d, g, g]
    grid = resize_2d(grid, (h, w), mode="cubic")
    patch_pe = grid.transpose(1, 2, 0).reshape(h * w, n_dims)
    return jnp.concatenate([cls_pe, patch_pe], axis=0)


class CLIPViT(nn.Module):
    width: int = 768
    layers: int = 12
    heads: int = 12
    patch_size: int = 16
    output_dim: int = 512
    input_resolution: int = 224  # grid the stored pos-emb was trained at
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    # opt-in ToMe token reduction: merge up to tome_r tokens per block
    # (ops/tome.py); 0 = the exact original program. Dense outputs are
    # recovered by composing the per-layer mappings and gathering the merged
    # stream back to every original position after the last block.
    tome_r: int = 0

    def setup(self):
        scale = self.width ** -0.5
        grid = self.input_resolution // self.patch_size
        self.conv1 = nn.Conv(
            self.width,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            # VALID, not flax's SAME default: torch's patchify conv has no
            # padding, so partial trailing patches are DROPPED at non-multiple
            # resolutions (reference clip_arch.py:345-351 at e.g. 37x33)
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(scale), (self.width,)
        )
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(scale),
            (grid * grid + 1, self.width),
        )
        self.ln_pre = LayerNorm32()
        self.blocks = [
            ResidualAttentionBlock(
                self.width, self.heads, dtype=self.dtype,
                attn_impl=self.attn_impl, name=f"resblocks_{i}",
            )
            for i in range(self.layers)
        ]
        self.ln_post = LayerNorm32()
        self.proj = self.param(
            "proj", nn.initializers.normal(scale), (self.width, self.output_dim)
        )

    def _forward_tokens(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, int, int]:
        """x: [b, 3, H, W] -> (tokens incl. CLS [b, 1+hw, width], h, w)."""
        b = x.shape[0]
        x = x.transpose(0, 2, 3, 1)  # NCHW -> NHWC (TPU conv layout)
        x = self.conv1(x.astype(self.dtype))
        _, h_feat, w_feat, _ = x.shape
        tokens = x.reshape(b, h_feat * w_feat, self.width)
        cls_tok = jnp.broadcast_to(
            self.class_embedding.astype(self.dtype)[None, None],
            (b, 1, self.width),
        )
        tokens = jnp.concatenate([cls_tok, tokens], axis=1)
        pe = interpolate_pos_embed(self.positional_embedding, (h_feat, w_feat))
        tokens = tokens + pe.astype(self.dtype)[None]
        tokens = self.ln_pre(tokens)
        if self.tome_r > 0:
            return self._run_blocks_tome(tokens) + (h_feat, w_feat)
        for block in self.blocks:
            tokens = block(tokens)
        return tokens, h_feat, w_feat

    def _run_blocks_tome(self, tokens: jnp.ndarray, valid=None):
        """ToMe path: progressively merged blocks; returns (dense tokens
        [b, s0, width] — the merged stream gathered back to every original
        position, CLS at 0 — ,) so callers see the dense contract.

        With `valid` ([b, s0], the padded batched path), padding tokens
        start at size 0: they merge with ZERO weight (free removals that
        the padding-aware scoring in ops/tome.py schedules first), the
        per-block key mask is simply size > 0, and a valid token landing in
        a zero-size slot is a lossless relabel — so valid outputs are
        invariant to padding pixel content (pinned in tests/test_tome.py).
        valid=None (the dense path) is bitwise the original program."""
        from zutis_tpu.ops.tome import merge_schedule

        b, s0, _ = tokens.shape
        if valid is None:
            size = jnp.ones((b, s0), jnp.float32)
        else:
            size = valid.astype(jnp.float32)
        assign = jnp.broadcast_to(
            jnp.arange(s0, dtype=jnp.int32)[None], (b, s0))
        schedule = merge_schedule(s0, self.tome_r, len(self.blocks))
        for block, r_eff in zip(self.blocks, schedule):
            kv_mask = None if valid is None else (size > 0)
            if r_eff <= 0:
                tokens = block(tokens, kv_mask=kv_mask)
                continue
            tokens, size, mapping = block(
                tokens, kv_mask=kv_mask, tome_r=r_eff, size=size)
            assign = jnp.take_along_axis(mapping, assign, axis=1)
        dense = jnp.take_along_axis(
            tokens, assign[..., None].astype(jnp.int32), axis=1)
        return (dense,)

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, int, int]:
        """Dense path: (patch_tokens [b, h*w, width] after ln_post, h, w)."""
        tokens, h_feat, w_feat = self._forward_tokens(x)
        patch_tokens = self.ln_post(tokens[:, 1:, :])
        return patch_tokens, h_feat, w_feat

    def encode_image(self, x: jnp.ndarray) -> jnp.ndarray:
        """Pooled path (original CLIP): ln_post(CLS) @ proj -> [b, output_dim]."""
        tokens, _, _ = self._forward_tokens(x)
        pooled = self.ln_post(tokens[:, :1, :])[:, 0]
        return pooled @ self.proj.astype(self.dtype)

    def forward_padded(
        self, x: jnp.ndarray, native_grid: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Batched variable-resolution forward under one static padded shape.

        x: [b, 3, H_pad, W_pad] images padded bottom/right to a bucket shape;
        native_grid: [b, 2] per-sample native token grids (H_i//patch,
        W_i//patch). Produces patch tokens identical (up to fp reassociation)
        to running each image through `__call__` at its native resolution:
        the positional embedding is interpolated per-sample to the native
        grid (ops/dynamic_shapes.py), and every attention layer masks keys to
        the sample's valid tokens (+ CLS), so valid tokens never see padding.
        Returns ([b, hp*wp, width] padded patch tokens — only the per-sample
        [h_i, w_i] top-left window is meaningful — and the [b, hp*wp]
        validity mask)."""
        from zutis_tpu.ops.dynamic_shapes import (
            interpolate_pos_embed_batched,
            token_valid_mask,
        )

        b = x.shape[0]
        x = x.transpose(0, 2, 3, 1)
        x = self.conv1(x.astype(self.dtype))
        _, hp, wp, _ = x.shape
        tokens = x.reshape(b, hp * wp, self.width)
        cls_tok = jnp.broadcast_to(
            self.class_embedding.astype(self.dtype)[None, None],
            (b, 1, self.width),
        )
        tokens = jnp.concatenate([cls_tok, tokens], axis=1)
        pe = interpolate_pos_embed_batched(
            self.positional_embedding, native_grid, (hp, wp)
        )
        tokens = tokens + pe.astype(self.dtype)
        patch_valid = token_valid_mask(native_grid, hp, wp)  # [b, hp*wp]
        kv_mask = jnp.concatenate(
            [jnp.ones((b, 1), jnp.int32), patch_valid], axis=1
        )
        tokens = self.ln_pre(tokens)
        if self.tome_r > 0:
            # padding-safe token merging: padding tokens carry size 0
            # (zero merge weight, masked keys) — see _run_blocks_tome
            (tokens,) = self._run_blocks_tome(
                tokens, valid=kv_mask.astype(jnp.float32))
        else:
            for block in self.blocks:
                tokens = block(tokens, kv_mask=kv_mask)
        patch_tokens = self.ln_post(tokens[:, 1:, :])
        return patch_tokens, patch_valid
