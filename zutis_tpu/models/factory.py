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

_RN_SPECS = {
    # stage blocks, stem width, embed_dim (width*32), output_dim, input_res
    # (reference networks/clip_arch.py:590-627 derives these from the
    # checkpoint; utils/utils.py:165 lists the supported arch names)
    "RN50": ((3, 4, 6, 3), 64, 2048, 1024, 224),
    "RN101": ((3, 4, 23, 3), 64, 2048, 512, 224),
    "RN50x4": ((4, 6, 10, 6), 80, 2560, 640, 288),
    "RN50x16": ((6, 8, 18, 8), 96, 3072, 768, 384),
    "RN50x64": ((3, 15, 36, 10), 128, 4096, 1024, 448),
}

_TEXT_SPECS = {
    # width, layers, heads, embed_dim
    "ViT-B/32": (512, 12, 8, 512),
    "ViT-B/16": (512, 12, 8, 512),
    "ViT-L/14": (768, 12, 12, 768),
    "ViT-L/14@336px": (768, 12, 12, 768),
    "RN50": (512, 12, 8, 1024),
    "RN101": (512, 12, 8, 512),
    "RN50x4": (640, 12, 10, 640),
    "RN50x16": (768, 12, 12, 768),
    "RN50x64": (1024, 12, 16, 1024),
}


def normalize_clip_arch(clip_arch: str) -> tuple:
    """-> (base_arch, upsample_tokens). 'dilatedRN50' is RN50 with the x2
    token upsample disabled — the reference's `lstrip("dilated")` plus the
    condition at networks/zutis.py:488-497; there is no actual dilation."""
    if clip_arch.startswith("dilated"):
        base = clip_arch[len("dilated"):]
        assert base in _RN_SPECS, f"unsupported clip_arch {clip_arch!r}"
        return base, False
    return clip_arch, True


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
        f"unsupported ViT clip_arch {clip_arch!r}; ViT variants: "
        f"{sorted(_VIT_SPECS)}; RN variants: {sorted(_RN_SPECS)}"
    )
    return ClipSpec(*_VIT_SPECS[clip_arch])


def build_zutis(
    clip_arch: str = "ViT-B/16",
    n_queries: int = 100,
    n_decoder_layers: int = 6,
    n_heads: int = 8,
    stop_gradient: bool = True,
    dtype=jnp.float32,
    attn_impl: str = "auto",
    encoder_type: str = "clip",
    tome_r: int = 0,
    decoder_pool: int = 1,
) -> ZUTIS:
    base_arch, upsample = normalize_clip_arch(clip_arch)
    common = dict(
        n_queries=n_queries,
        n_decoder_layers=n_decoder_layers,
        n_heads=n_heads,
        stop_gradient=stop_gradient,
        upsample_tokens=upsample,
        dtype=dtype,
        attn_impl=attn_impl,
        tome_r=tome_r,
        decoder_pool=decoder_pool,
    )
    if encoder_type == "dino":
        # comparison arm (reference networks/zutis.py:73-100): DINO ViT-B/16
        # encoder bridged into the clip_arch's text dim by vision_to_text_ffn
        text_dim = (_VIT_SPECS[base_arch][4] if base_arch in _VIT_SPECS
                    else _RN_SPECS[base_arch][3])
        return ZUTIS(
            encoder_family="dino",
            width=text_dim,
            text_dim=text_dim,
            patch_size=16,
            input_resolution=224,
            **common,
        )
    if base_arch in _RN_SPECS:
        layers, rn_width, embed, out_dim, res = _RN_SPECS[base_arch]
        return ZUTIS(
            encoder_family="rn",
            width=embed,
            text_dim=out_dim,
            input_resolution=res,
            rn_layers=layers,
            rn_width=rn_width,
            **common,
        )
    s = clip_spec(base_arch)
    return ZUTIS(
        width=s.width,
        encoder_layers=s.layers,
        encoder_heads=s.heads,
        patch_size=s.patch,
        text_dim=s.embed_dim,
        input_resolution=s.input_resolution,
        **common,
    )


def build_text_encoder(clip_arch: str, dtype=jnp.float32) -> CLIPTextEncoder:
    # "dilatedRN50" etc. share the base arch's text tower (the dilated
    # prefix only disables the visual token upsample, normalize_clip_arch)
    base_arch, _ = normalize_clip_arch(clip_arch)
    w, layers, heads, ed = _TEXT_SPECS[base_arch]
    return CLIPTextEncoder(
        width=w, layers=layers, heads=heads, embed_dim=ed, dtype=dtype,
    )


def clip_checkpoint_path(clip_arch: str, assets_dir: str) -> str:
    base_arch, _ = normalize_clip_arch(clip_arch)
    name = base_arch.replace("/", "-").replace("@", "-") + ".pt"
    return os.path.join(assets_dir, name)


def load_clip_params(
    clip_arch: str, assets_dir: str
) -> Tuple[dict, dict]:
    """-> (visual_params for CLIPViT or ModifiedResNet — dispatched on the
    arch family — and text_params for CLIPTextEncoder)."""
    from zutis_tpu.models import weights as W

    base_arch, _ = normalize_clip_arch(clip_arch)
    sd = W.load_torch_state_dict(clip_checkpoint_path(base_arch, assets_dir))
    if base_arch in _RN_SPECS:
        visual = W.convert_clip_rn_visual(sd)
    else:
        visual = W.convert_clip_visual(sd)
    return visual, W.convert_clip_text(sd)


def find_merges_file(assets_dir: str) -> Optional[str]:
    for name in ("bpe_simple_vocab_16e6.txt.gz", "bpe_simple_vocab_16e6.txt"):
        p = os.path.join(assets_dir, name)
        if os.path.exists(p):
            return p
    return None
