"""Decoder-memory pooling throughput sweep, composed with ToMe, on the
real chip.

Measures the headline dense-inference program (bench.py's exact step) over
(tome_r, decoder_pool) pairs. The two levers cut the two halves of the
PERF.md device budget that algorithmic reduction can reach: ToMe shrinks
the encoder stream (~60% of device time), decoder_pool shrinks the
cross-attention memory the 100 queries read (~20 ms/iter of K/V projection
+ attention over 2304 tokens, untouched by ToMe). (r=0, pool=1) is the
shipped baseline program. Measurement discipline is bench.py's: batch-size
sweep per config, three timed windows best-of, forced fetches, full-window
warm-up (CLAUDE.md tunnel hazards).

Usage (real TPU; do NOT set JAX_PLATFORMS):
    PYTHONPATH=/root/.axon_site:/root/repo python tools/decmem_bench.py \
        [--configs 0:1,0:2,0:4,40:1,40:2,40:4] [--batches 64,96,48] \
        [--out DECMEM_BENCH.json]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def measure_config(rng, tome_r: int, pool: int, batches,
                   image_size=384, n_cat=919, patch_size=16):
    import jax
    import jax.numpy as jnp

    from bench import build_infer
    from zutis_tpu.models import ZUTIS

    model = ZUTIS(
        width=768, encoder_layers=12, encoder_heads=12,
        patch_size=patch_size, text_dim=512, n_queries=100,
        n_decoder_layers=6, n_heads=8, input_resolution=224,
        dtype=jnp.bfloat16, tome_r=tome_r, decoder_pool=pool,
    )
    init_x = jnp.asarray(rng.randn(1, 3, image_size, image_size)
                         .astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), init_x)["params"]
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.ndim > 1 else x, params)
    text = rng.randn(n_cat, 512).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    infer = build_infer(model, params, jnp.asarray(text))

    best, best_batch = 0.0, 0
    for batch in batches:
        try:
            x = jnp.asarray(rng.randn(batch, 3, image_size, image_size)
                            .astype(np.float32))
            sem, obj = infer(params, x)
            float(jnp.sum(obj))
            n_iters = max(3, 1152 // batch)
            rate = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(n_iters):
                    sem, obj = infer(params, x)
                float(jnp.sum(obj)) + float(jnp.sum(sem))
                rate = max(rate, batch * n_iters /
                           (time.perf_counter() - t0))
        except Exception as e:
            print(f"  r={tome_r} pool={pool} batch={batch}: "
                  f"{type(e).__name__}: {str(e)[:120]}",
                  file=sys.stderr, flush=True)
            continue
        if rate > best:
            best, best_batch = rate, batch
    return best, best_batch


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=str,
                    default="0:1,0:2,0:4,40:1,40:2,40:4")
    ap.add_argument("--batches", type=str, default="64,96,48")
    ap.add_argument("--out", type=str, default="DECMEM_BENCH.json")
    # ViT-B/32 = the reference's OTHER published arch (76.9 img/s baseline,
    # project page ImageNet-S table): patch 32, 145 tokens at 384px
    ap.add_argument("--arch", choices=["b16", "b32"], default="b16")
    args = ap.parse_args(argv)

    from zutis_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    batches = [int(b) for b in args.batches.split(",")]
    rows = []
    base_rate = None
    for spec in args.configs.split(","):
        r, pool = (int(v) for v in spec.split(":"))
        rate, bb = measure_config(
            rng, r, pool, batches,
            patch_size=32 if args.arch == "b32" else 16)
        if r == 0 and pool == 1:
            base_rate = rate
        grid = (384 // (32 if args.arch == "b32" else 16)) * 2
        rows.append({
            "tome_r": r,
            "decoder_pool": pool,
            "memory_tokens": grid * grid // (pool * pool),
            "img_per_sec": round(rate, 1),
            "best_batch": bb,
            "vs_base": round(rate / base_rate, 3) if base_rate else None,
        })
        print(json.dumps(rows[-1]), flush=True)
    with open(args.out, "w") as f:
        json.dump({"image_size": 384,
                   "arch": "ViT-B/32" if args.arch == "b32" else "ViT-B/16",
                   "note": "bench.py discipline: batch sweep per config, "
                           "3 timed windows best-of, forced fetches, "
                           "full-window warm-up. memory_tokens is the "
                           "cross-attention key count (dense 48x48=2304).",
                   "rows": rows}, f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
    import os

    os._exit(0)  # skip jax teardown (can hang under the tunnel)
