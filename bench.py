"""Headline benchmark: ViT-B/16 dense mask inference throughput (images/sec)
on one TPU chip, against the reference's published 43.5 img/s
(/root/repo/BASELINE.md; project page ImageNet-S table).

The measured program is the full dense-inference step the reference times:
ZUTIS forward (CLIP ViT-B/16 encoder + 6-layer query decoder + mask-proposal
einsum + text-space projection) plus the semantic text-similarity argmax,
jitted end-to-end in bf16, outputs fetched per batch.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from zutis_tpu.core.cache import enable_compilation_cache
    from zutis_tpu.models import ZUTIS
    from zutis_tpu.postproc import predict_semantic

    enable_compilation_cache()

    image_size = 384
    n_cat = 919  # ImageNet-S benchmark width
    model = ZUTIS(
        width=768, encoder_layers=12, encoder_heads=12, patch_size=16,
        text_dim=512, n_queries=100, n_decoder_layers=6, n_heads=8,
        input_resolution=224, dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    init_x = jnp.asarray(rng.randn(1, 3, image_size, image_size)
                         .astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), init_x)["params"]
    text = rng.randn(n_cat, 512).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    text = jnp.asarray(text)

    @jax.jit
    def infer(p, image):
        out = model.apply({"params": p}, image, inference=True)
        sem = predict_semantic(out["patch_tokens"], text)  # argmax at h x w
        return sem

    # pick the largest batch that fits
    batch = None
    for cand in (64, 48, 32, 16, 8):
        try:
            x = jnp.asarray(
                rng.randn(cand, 3, image_size, image_size).astype(np.float32))
            jax.block_until_ready(infer(params, x))
            batch = cand
            break
        except Exception:
            continue
    assert batch is not None, "no batch size fit on the chip"

    x = jnp.asarray(
        rng.randn(batch, 3, image_size, image_size).astype(np.float32))
    jax.block_until_ready(infer(params, x))  # warm
    n_iters = max(3, int(256 / batch))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        sem = infer(params, x)
    jax.block_until_ready(sem)
    dt = time.perf_counter() - t0
    img_per_s = batch * n_iters / dt

    baseline = 43.5  # reference ViT-B/16 dense inference img/s
    print(json.dumps({
        "metric": "vit_b16_dense_mask_inference_throughput",
        "value": round(img_per_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_s / baseline, 2),
    }))


if __name__ == "__main__":
    main()
