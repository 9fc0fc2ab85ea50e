"""Headline benchmark: ViT-B/16 dense mask inference throughput (images/sec)
on one TPU chip, against the reference's published 43.5 img/s
(/root/repo/BASELINE.md; project page ImageNet-S table).

The measured program is the HONEST dense-inference step at 384x384 in bf16:
ZUTIS forward — CLIP ViT-B/16 encoder, 6-layer query decoder over the
x2-upsampled token grid, last-layer mask-proposal einsum, text-space
projection — plus the 919-category semantic argmax and per-query objectness
maxima, jitted end-to-end. (Round 1's bench returned only the semantic map,
which let XLA dead-code-eliminate the decoder; this program keeps every
component the reference's forward computes live.)

Roofline context for the >=2,000 img/s/chip north star (BASELINE.md):
  - The program executes ~156 GFLOP/image in matmuls (encoder ~110, decoder
    head ~44, semantic einsum ~2). One v5e chip peaks at ~197 bf16 TFLOP/s
    (measured 178 TF/s on a 4096^3 chain = 90% of peak), so even a 100%-MXU
    execution of these FLOPs caps at ~1,260 img/s at 384px — the 2,000
    target is unreachable for this exact program on one chip. int8 was
    measured at PARITY with bf16 under this runtime (no MXU int8 speedup is
    exposed through XLA here), so the remaining levers are algorithmic
    (fewer tokens/lower resolution at matched accuracy) or multi-chip
    scaling, which a per-chip metric does not credit.
  - Measured composition at batch 64 (fp-forced timings): non-attention
    encoder work ~65 ms, attention matmuls ~23 ms, softmax ~34 ms (reduced
    by the clamped max-free bf16 softmax in ops/attention.py), decoder head
    ~32 ms, semantic argmax ~6 ms.
  - The fused Pallas attention kernel (ops/flash_attention.py) removes the
    logits round-trips entirely, but THIS environment's tunnelled TPU
    runtime nondeterministically wedges on any Pallas dispatch (jax's own
    flash kernel included), so the shipped default is the tuned XLA path
    and the kernel is opt-in via ZUTIS_TPU_ATTN=pallas.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np


def build_infer(model, params, text):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def infer(p, image):
        out = model.apply({"params": p}, image, inference=True)
        logits = jnp.einsum(
            "nc,bhwc->bnhw", text, out["patch_tokens"],
            preferred_element_type=jnp.float32,
        )
        sem = jnp.argmax(logits, axis=1)
        # per-query objectness maxima keep the decoder head live and are a
        # real serving output; full masks stay on device (serving would
        # RLE/stream them without a dense D2H)
        obj = jnp.max(out["mask_proposals"][:, -1], axis=(-2, -1))
        return sem, obj

    return lambda p, image: infer(p, image)


def main():
    import jax
    import jax.numpy as jnp
    from zutis_tpu.core.cache import enable_compilation_cache
    from zutis_tpu.models import ZUTIS

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
    infer = build_infer(model, params, text)

    def measure(batch: int, n_images: int = 1152) -> float:
        x = jnp.asarray(
            rng.randn(batch, 3, image_size, image_size).astype(np.float32))
        sem, obj = infer(params, x)  # compile + warm
        float(jnp.sum(obj))  # force full execution before timing
        n_iters = max(3, n_images // batch)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            sem, obj = infer(params, x)
        # force: a reduction fetch cannot complete before the program ran
        float(jnp.sum(obj)) + float(jnp.sum(sem))
        dt = time.perf_counter() - t0
        return batch * n_iters / dt

    best = 0.0
    for batch in (192, 128):
        try:
            best = max(best, measure(batch))
        except Exception:
            continue
    assert best > 0, "no batch size fit on the chip"

    baseline = 43.5  # reference ViT-B/16 dense inference img/s
    print(json.dumps({
        "metric": "vit_b16_dense_mask_inference_throughput",
        "value": round(best, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(best / baseline, 2),
    }))


if __name__ == "__main__":
    main()
