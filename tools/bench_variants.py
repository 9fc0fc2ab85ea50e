"""End-to-end dense-bench variant tuning on the real TPU (VERDICT r3 task 2).

Measures the FULL bench program (bench.py's honest dense-inference step,
batch 64) under targeted rewrites of the residuals PERF.md names, plus the
large-batch sweep (task 7). All variants run in ONE process (tunnel hygiene,
CLAUDE.md) with the bench's measurement discipline: warm window, best-of-3
timed windows, forced fetches.

Variants:
  base          shipped program
  q128          decoder attention at query count 128 (zero-padded tail,
                outputs for the first 100 queries unchanged — M=100 MXU
                padding probe)
  semhwn        semantic logits einsum in natural [b,h,w,n] dot layout +
                lane argmax (avoids the bnhw transposed store)
  both          q128 + semhwn
  b128/b192     batch sweep at the best variant

Usage: timeout 1800 python tools/bench_variants.py [--batches 64]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_model():
    import jax.numpy as jnp
    from zutis_tpu.models import ZUTIS

    return ZUTIS(
        width=768, encoder_layers=12, encoder_heads=12, patch_size=16,
        text_dim=512, n_queries=100, n_decoder_layers=6, n_heads=8,
        input_resolution=224, dtype=jnp.bfloat16,
    )


def patch_q128(enabled: bool):
    """Route decoder-side attention through a 128-query padded call. Applied
    by monkeypatching the bshd entry the layers use; encoder calls (sq=577)
    pass through untouched."""
    import zutis_tpu.models.layers as L
    from zutis_tpu.ops.attention import dot_product_attention_bshd as orig

    if not enabled:
        L.dot_product_attention_bshd = orig
        return

    import jax.numpy as jnp

    def padded(q, k, v, bias=None, kv_mask=None, impl="auto"):
        sq = q.shape[1]
        if sq != 100:
            return orig(q, k, v, bias=bias, kv_mask=kv_mask, impl=impl)
        pad = [(0, 0), (0, 28), (0, 0), (0, 0)]
        out = orig(jnp.pad(q, pad), k, v, bias=bias, kv_mask=kv_mask,
                   impl=impl)
        return out[:, :100]

    L.dot_product_attention_bshd = padded


def patch_pallas_dec(enabled: bool):
    """Route the decoder CROSS-attention (sq=100, sk>=1000) through the
    Pallas flash kernel — the one attention shape round 3 never
    Pallas-tuned. Self-attention (100x100) and the encoder stay XLA."""
    import zutis_tpu.models.layers as L
    from zutis_tpu.ops.attention import dot_product_attention_bshd as orig

    if not enabled:
        L.dot_product_attention_bshd = orig
        return

    def routed(q, k, v, bias=None, kv_mask=None, impl="auto"):
        if q.shape[1] == 100 and k.shape[1] >= 1000 and bias is None:
            from zutis_tpu.ops.flash_attention import flash_attention

            out = flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), kv_mask=kv_mask,
            )
            return out.transpose(0, 2, 1, 3)
        return orig(q, k, v, bias=bias, kv_mask=kv_mask, impl=impl)

    L.dot_product_attention_bshd = routed


def build_infer(model, params, text, semhwn: bool):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def infer(p, image):
        out = model.apply({"params": p}, image, inference=True)
        if semhwn:
            logits = jnp.einsum(
                "bhwc,nc->bhwn", out["patch_tokens"], text,
                preferred_element_type=jnp.float32,
            )
            sem = jnp.argmax(logits, axis=-1)
        else:
            logits = jnp.einsum(
                "nc,bhwc->bnhw", text, out["patch_tokens"],
                preferred_element_type=jnp.float32,
            )
            sem = jnp.argmax(logits, axis=1)
        obj = jnp.max(out["mask_proposals"][:, -1], axis=(-2, -1))
        return sem, obj

    return infer


def measure(infer, params, x, batch: int, n_images: int = 1152) -> float:
    import jax.numpy as jnp

    sem, obj = infer(params, x)
    float(jnp.sum(obj))
    n_iters = max(3, n_images // batch)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            sem, obj = infer(params, x)
        float(jnp.sum(obj)) + float(jnp.sum(sem))
        dt = time.perf_counter() - t0
        best = max(best, batch * n_iters / dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--sweep", type=str, default="128,192",
                    help="extra batch sizes for the best variant")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from zutis_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    model = build_model()
    image_size, n_cat = 384, 919
    init_x = jnp.asarray(rng.randn(1, 3, image_size, image_size)
                         .astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), init_x)["params"]
    params = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16) if v.ndim > 1 else v, params)
    text = rng.randn(n_cat, 512).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=1, keepdims=True))
    x = jnp.asarray(rng.randn(args.batch, 3, image_size, image_size)
                    .astype(np.float32))

    import os as _os

    only = _os.environ.get("BENCH_VARIANTS", "")
    results = {}
    variants = [
        ("base", patch_q128, False, False),
        ("q128", patch_q128, True, False),
        ("semhwn", patch_q128, False, True),
        ("both", patch_q128, True, True),
        ("pallas_dec", patch_pallas_dec, True, False),
    ]
    if only:
        wanted = set(only.split(","))
        variants = [v for v in variants if v[0] in wanted]
    for name, patcher, flag, semhwn in variants:
        patcher(flag)
        infer = build_infer(model, params, text, semhwn)
        r = measure(infer, params, x, args.batch)
        results[name] = round(r, 1)
        print(json.dumps({"variant": name, "batch": args.batch,
                          "img_per_sec": round(r, 1)}), flush=True)
        patcher(False)

    best_name = max(results, key=results.get)
    patcher, flag, semhwn = {
        n: (p, f, s) for n, p, f, s in variants}[best_name]
    patcher(flag)
    infer = build_infer(model, params, text, semhwn)
    sweep = [] if only else [int(v) for v in args.sweep.split(",") if v]
    for b in sweep:
        xb = jnp.asarray(rng.randn(b, 3, image_size, image_size)
                         .astype(np.float32))
        try:
            r = measure(infer, params, xb, b)
        except Exception as e:
            print(json.dumps({"variant": f"{best_name}@b{b}",
                              "error": str(e)[:160]}), flush=True)
            continue
        results[f"{best_name}@b{b}"] = round(r, 1)
        print(json.dumps({"variant": f"{best_name}@b{b}", "batch": b,
                          "img_per_sec": round(r, 1)}), flush=True)

    print("RESULTS " + json.dumps(results), flush=True)
    import os
    import sys

    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
