"""Model factory: clip_arch string -> ZUTIS / encoders, plus CLIP asset
loading (reference utils/utils.py:148-176 `get_network` + clip.load).

CLIP checkpoints are the official OpenAI .pt files placed in a local assets
directory (this framework has no network access at runtime):
  <assets>/ViT-B-16.pt, <assets>/ViT-B-32.pt, <assets>/ViT-L-14.pt,
  <assets>/ViT-L-14-336px.pt, and the BPE merges file
  <assets>/bpe_simple_vocab_16e6.txt(.gz).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp

from zutis_tpu.models.text import CLIPTextEncoder
from zutis_tpu.models.zutis import ZUTIS

_VIT_SPECS = {
    # width, layers, heads, patch, embed_dim, input_resolution
    "ViT-B/32": (768, 12, 12, 32, 512, 224),
    "ViT-B/16": (768, 12, 12, 16, 512, 224),
    "ViT-L/14": (1024, 24, 16, 14, 768, 224),
    "ViT-L/14@336px": (1024, 24, 16, 14, 768, 336),
}

_TEXT_SPECS = {
    # width, layers, heads, embed_dim
    "ViT-B/32": (512, 12, 8, 512),
    "ViT-B/16": (512, 12, 8, 512),
    "ViT-L/14": (768, 12, 12, 768),
    "ViT-L/14@336px": (768, 12, 12, 768),
}


@dataclass
class ClipSpec:
    width: int
    layers: int
    heads: int
    patch: int
    embed_dim: int
    input_resolution: int


def clip_spec(clip_arch: str) -> ClipSpec:
    assert clip_arch in _VIT_SPECS, (
        f"unsupported clip_arch {clip_arch!r}; ViT variants: "
        f"{sorted(_VIT_SPECS)} (ModifiedResNet variants land with the RN "
        f"encoder module)"
    )
    return ClipSpec(*_VIT_SPECS[clip_arch])


def build_zutis(
    clip_arch: str = "ViT-B/16",
    n_queries: int = 100,
    n_decoder_layers: int = 6,
    n_heads: int = 8,
    stop_gradient: bool = True,
    dtype=jnp.float32,
    attn_impl: str = "xla",
) -> ZUTIS:
    s = clip_spec(clip_arch)
    return ZUTIS(
        width=s.width,
        encoder_layers=s.layers,
        encoder_heads=s.heads,
        patch_size=s.patch,
        text_dim=s.embed_dim,
        input_resolution=s.input_resolution,
        n_queries=n_queries,
        n_decoder_layers=n_decoder_layers,
        n_heads=n_heads,
        stop_gradient=stop_gradient,
        dtype=dtype,
        attn_impl=attn_impl,
    )


def build_text_encoder(clip_arch: str, dtype=jnp.float32) -> CLIPTextEncoder:
    w, layers, heads, ed = _TEXT_SPECS[clip_arch]
    return CLIPTextEncoder(
        width=w, layers=layers, heads=heads, embed_dim=ed, dtype=dtype,
    )


def clip_checkpoint_path(clip_arch: str, assets_dir: str) -> str:
    name = clip_arch.replace("/", "-").replace("@", "-") + ".pt"
    return os.path.join(assets_dir, name)


def load_clip_params(
    clip_arch: str, assets_dir: str
) -> Tuple[dict, dict]:
    """-> (visual_params for CLIPViT, text_params for CLIPTextEncoder)."""
    from zutis_tpu.models import weights as W

    sd = W.load_torch_state_dict(clip_checkpoint_path(clip_arch, assets_dir))
    return W.convert_clip_visual(sd), W.convert_clip_text(sd)


def find_merges_file(assets_dir: str) -> Optional[str]:
    for name in ("bpe_simple_vocab_16e6.txt.gz", "bpe_simple_vocab_16e6.txt"):
        p = os.path.join(assets_dir, name)
        if os.path.exists(p):
            return p
    return None
