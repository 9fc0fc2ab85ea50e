"""SelfMask pseudo-labeler: frozen DINO DeiT-S/8 encoder + 20-query decoder
+ objectness MLP; picks the highest-objectness mask per image.

Behavioural contract (reference networks/selfmask/selfmask.py:13-245 and
networks/selfmask/vision_transformer.py):
  encoder — DeiT-small (embed 384, 12 layers, 6 heads, patch 8, GELU MLP,
      pre-norm); inputs are zero-padded right/bottom to a patch multiple
      (make_input_divisible, vision_transformer.py:260-267); position
      embeddings bicubic-interpolated exact-size (identity at the
      native grid; vision_transformer.py:377-401 — no fudge)
      (vision_transformer.py:377-...).
  decoder — 6 DETR decoder layers (FFN 1536, dropout 0), tgt=0, query_pos =
      20 learned N(0,1) queries, NO memory positional encoding, final shared
      LayerNorm, last layer only.
  heads — mask logits = sigmoid(queries . upsampled-x2 tokens); objectness =
      3-layer MLP(384, 384, 1).
  inference (selfmask.py:204-237) — upsample masks x4 bilinear, crop to the
      original H x W, take argmax-objectness query, threshold 0.5. The
      bilateral-solver refinement runs on host (ops/bilateral.py) over this
      output.

The reference's released checkpoint (selfmask_nq20.pt) converts through
`convert_selfmask_checkpoint`."""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from zutis_tpu.models.decoder import QueryDecoder
from zutis_tpu.models.layers import MLP, LayerNorm32, MultiHeadAttention
from zutis_tpu.models.vit import interpolate_pos_embed_exact
from zutis_tpu.ops.resize import interpolate


class DeiTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = LayerNorm32(name="norm1")(x)
        x = x + MultiHeadAttention(self.dim, self.heads, dtype=self.dtype,
                                   name="attn")(y, y, y)
        y = LayerNorm32(name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(y)
        return x + y


class DeiTEncoder(nn.Module):
    """DINO DeiT-small returning final-norm patch tokens."""

    embed_dim: int = 384
    depth: int = 12
    heads: int = 6
    patch_size: int = 8
    base_grid: int = 28  # 224 / 8: grid the stored pos-emb corresponds to
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, int, int]:
        """x: [b, 3, H, W] (padded to patch multiples by the caller) ->
        (tokens [b, 1 + hw, d] after final norm, h, w)."""
        b = x.shape[0]
        x = x.transpose(0, 2, 3, 1)
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="patch_embed")(x.astype(self.dtype))
        _, h, w, _ = x.shape
        tokens = x.reshape(b, h * w, self.embed_dim)
        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.embed_dim))
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (self.base_grid * self.base_grid + 1, self.embed_dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(self.dtype),
                              (b, 1, self.embed_dim)), tokens], axis=1)
        # reference selfmask/vision_transformer.py:377-401: exact-size
        # bicubic, identity at the native grid, NO +0.1 fudge (that
        # fudge is the CLIP tower's; the two references differ)
        pe = interpolate_pos_embed_exact(pos_embed, (h, w))
        tokens = tokens + pe.astype(self.dtype)[None]
        for i in range(self.depth):
            tokens = DeiTBlock(self.embed_dim, self.heads, dtype=self.dtype,
                               name=f"blocks_{i}")(tokens)
        tokens = LayerNorm32(name="norm")(tokens)
        return tokens, h, w


class SelfMask(nn.Module):
    n_queries: int = 20
    patch_size: int = 8
    n_decoder_layers: int = 6
    embed_dim: int = 384
    heads: int = 6
    scale_factor: int = 2
    base_grid: int = 28  # grid of the stored pos-emb (224 / patch 8)
    depth: int = 12
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = DeiTEncoder(
            embed_dim=self.embed_dim, heads=self.heads, depth=self.depth,
            patch_size=self.patch_size, base_grid=self.base_grid,
            dtype=self.dtype, name="encoder")
        self.decoder = QueryDecoder(
            d_model=self.embed_dim, heads=self.heads,
            num_layers=self.n_decoder_layers,
            dim_feedforward=self.embed_dim * 4,
            return_intermediate=False, dtype=self.dtype, name="decoder")
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.n_queries, self.embed_dim))
        self.ffn = MLP(self.embed_dim, 1, 3, dtype=self.dtype, name="ffn")

    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """x: [b, 3, H, W], H/W multiples of patch_size (pad on host).
        Returns mask_pred [b, Q, 2h, 2w] in [0,1] and objectness [b, Q]."""
        b = x.shape[0]
        tokens, h, w = self.encoder(x)
        patch_tokens = tokens[:, 1:, :]  # [b, hw, d]

        query_pos = jnp.broadcast_to(
            self.query_embed.astype(self.dtype)[None],
            (b, self.n_queries, self.embed_dim))
        tgt = jnp.zeros_like(query_pos)
        queries = self.decoder(tgt, patch_tokens, pos=None,
                               query_pos=query_pos)[0]  # [b, Q, d]

        grid = patch_tokens.reshape(b, h, w, self.embed_dim)
        grid = grid.transpose(0, 3, 1, 2)
        grid = interpolate(grid, scale_factor=self.scale_factor,
                           mode="bilinear")  # [b, d, 2h, 2w]
        logits = jnp.einsum("bqd,bdhw->bqhw", queries, grid,
                            preferred_element_type=jnp.float32)
        mask_pred = nn.sigmoid(logits)
        objectness = self.ffn(queries)[..., 0]  # [b, Q]
        return {"mask_pred": mask_pred.astype(jnp.float32),
                "objectness": objectness.astype(jnp.float32)}

    def best_masks(self, x: jnp.ndarray) -> jnp.ndarray:
        """Inference path (selfmask.py:204-224): x4 bilinear upsample, crop
        to input size, pick the argmax-objectness query, threshold 0.5 ->
        [b, H, W] uint8."""
        H, W = x.shape[-2:]
        out = self(x)
        up = interpolate(out["mask_pred"], scale_factor=4, mode="bilinear")
        up = up[..., :H, :W]
        best = jnp.argmax(out["objectness"], axis=1)
        sel = jnp.take_along_axis(
            up, best[:, None, None, None], axis=1)[:, 0]
        return (sel > 0.5).astype(jnp.uint8)


def pad_to_patch_multiple(x: np.ndarray, patch: int = 8) -> np.ndarray:
    """Zero-pad [.., H, W] right/bottom to patch multiples
    (reference vision_transformer.py:260-267)."""
    h, w = x.shape[-2:]
    ph, pw = (-h) % patch, (-w) % patch
    if ph == 0 and pw == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 2) + [(0, ph), (0, pw)]
    return np.pad(x, pad)


def convert_selfmask_checkpoint(sd) -> dict:
    """Reference selfmask_nq20.pt state_dict -> SelfMask flax params."""
    from zutis_tpu.models.weights import _dense, _ln, _mha, _mlp3, _np

    enc = {
        "patch_embed": {
            "kernel": _np(sd["encoder.patch_embed.proj.weight"]
                          ).transpose(2, 3, 1, 0),
            "bias": _np(sd["encoder.patch_embed.proj.bias"]),
        },
        "cls_token": _np(sd["encoder.cls_token"]).reshape(1, 1, -1),
        "pos_embed": _np(sd["encoder.pos_embed"])[0],
        "norm": _ln(sd, "encoder.norm"),
    }
    i = 0
    while f"encoder.blocks.{i}.norm1.weight" in sd:
        p = f"encoder.blocks.{i}"
        qkv_w = _np(sd[f"{p}.attn.qkv.weight"])
        qkv_b = _np(sd[f"{p}.attn.qkv.bias"])
        d = qkv_w.shape[1]
        attn = {}
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            attn[name] = {"kernel": qkv_w[j * d:(j + 1) * d].T,
                          "bias": qkv_b[j * d:(j + 1) * d]}
        attn["out_proj"] = _dense(sd, f"{p}.attn.proj")
        enc[f"blocks_{i}"] = {
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "attn": attn,
            "fc1": _dense(sd, f"{p}.mlp.fc1"),
            "fc2": _dense(sd, f"{p}.mlp.fc2"),
        }
        i += 1

    dec = {"norm": _ln(sd, "decoder.norm")}
    i = 0
    while f"decoder.layers.{i}.norm1.weight" in sd:
        p = f"decoder.layers.{i}"
        dec[f"layers_{i}"] = {
            "self_attn": _mha(sd, f"{p}.self_attn"),
            "cross_attn": _mha(sd, f"{p}.multihead_attn"),
            "linear1": _dense(sd, f"{p}.linear1"),
            "linear2": _dense(sd, f"{p}.linear2"),
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "norm3": _ln(sd, f"{p}.norm3"),
        }
        i += 1
    return {
        "encoder": enc,
        "decoder": dec,
        "query_embed": _np(sd["query_embed"]),
        "ffn": _mlp3(sd, "ffn"),
    }
