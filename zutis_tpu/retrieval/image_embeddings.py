"""Index-archive image-embedding extraction.

Behavioural contract (reference utils/extract_image_embeddings.py:21-115):
batch-encode every image of an index archive (ImageNet2012-train / PASS)
with the CLIP retrieval encoder (ViT-L/14@336px), L2-normalise, and store a
{filename: float32 embedding} pickle bank keyed by absolute path.

TPU-first: images are center-cropped/resized host-side to the encoder's
input resolution; encoding runs jitted in fixed-size batches; the resulting
bank feeds retrieval/bank.py (optionally sharded across a mesh)."""
from __future__ import annotations

import pickle
from typing import Dict, List, Optional

import numpy as np
from PIL import Image


# CLIP's published preprocessing constants
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess(pil: Image.Image, resolution: int) -> np.ndarray:
    """Resize shorter side to `resolution` (bicubic), center crop, CLIP
    normalisation -> [3, R, R] float32. Size arithmetic matches
    torchvision exactly (the reference pipeline,
    extract_image_embeddings.py:97-99): the LONG side TRUNCATES
    (`int(size * long / short)`, _compute_resized_output_size) and the
    center-crop offset rounds (`int(round(delta / 2.))`, F.center_crop) —
    a round()/floor-div translation shifts the crop window by 1 px for
    some aspect ratios, perturbing embeddings vs reference-built banks."""
    w, h = pil.size
    if w <= h:
        new_w, new_h = resolution, int(resolution * h / w)
    else:
        new_w, new_h = int(resolution * w / h), resolution
    pil = pil.resize((new_w, new_h), Image.BICUBIC)
    w, h = pil.size
    left = int(round((w - resolution) / 2.0))
    top = int(round((h - resolution) / 2.0))
    pil = pil.crop((left, top, left + resolution, top + resolution))
    arr = np.asarray(pil.convert("RGB"), np.float32) / 255.0
    arr = (arr - CLIP_MEAN) / CLIP_STD
    return np.ascontiguousarray(arr.transpose(2, 0, 1))


def extract_image_embeddings(
    p_images: List[str],
    visual_encoder,
    visual_params,
    resolution: int = 336,
    batch_size: int = 32,
    fp: Optional[str] = None,
) -> Dict[str, np.ndarray]:
    """-> {path: unit-norm float32 embedding}; optionally pickled to `fp`
    in the reference bank format (extract_image_embeddings.py:21-86)."""
    import jax
    import jax.numpy as jnp

    encode = jax.jit(
        lambda p, x: visual_encoder.apply(
            {"params": p}, x, method=type(visual_encoder).encode_image)
    )
    out: Dict[str, np.ndarray] = {}
    for i in range(0, len(p_images), batch_size):
        chunk = p_images[i:i + batch_size]
        arrs = [clip_preprocess(Image.open(p), resolution) for p in chunk]
        pad = batch_size - len(arrs)
        batch = np.stack(arrs + [arrs[-1]] * pad)
        emb = np.asarray(encode(visual_params, jnp.asarray(batch)))
        emb = emb[:len(chunk)].astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        for p, e in zip(chunk, emb):
            out[p] = e
    if fp is not None:
        with open(fp, "wb") as f:
            pickle.dump(out, f)
    return out
