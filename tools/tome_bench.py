"""ToMe throughput sweep on the real chip (VERDICT r4 task 3).

Measures the headline dense-inference program (bench.py's exact step:
ViT-B/16, 384px, bf16, 919-category argmax + objectness maxima) at a sweep
of tome_r values (tokens merged per encoder block, ops/tome.py). r=0 is the
shipped baseline program. Measurement discipline is bench.py's: batch-size
sweep per r, three timed windows best-of, forced fetches, full-window
warm-up (CLAUDE.md tunnel hazards).

Usage (real TPU; do NOT set JAX_PLATFORMS):
    PYTHONPATH=/root/.axon_site:/root/repo python tools/tome_bench.py \
        [--rs 0,8,16,24,32] [--batches 64,96,48] [--out TOME_BENCH.json]

Writes one JSON object with a row per r: {r, tokens_final, img_per_sec,
best_batch, vs_r0}.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def measure_r(rng, tome_r: int, batches, image_size=384, n_cat=919):
    import jax
    import jax.numpy as jnp

    from bench import build_infer
    from zutis_tpu.models import ZUTIS

    model = ZUTIS(
        width=768, encoder_layers=12, encoder_heads=12, patch_size=16,
        text_dim=512, n_queries=100, n_decoder_layers=6, n_heads=8,
        input_resolution=224, dtype=jnp.bfloat16, tome_r=tome_r,
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
            print(f"  r={tome_r} batch={batch}: {type(e).__name__}: "
                  f"{str(e)[:120]}", file=sys.stderr, flush=True)
            continue
        if rate > best:
            best, best_batch = rate, batch
    return best, best_batch


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rs", type=str, default="0,8,16,24,32")
    ap.add_argument("--batches", type=str, default="64,96,48")
    ap.add_argument("--out", type=str, default="TOME_BENCH.json")
    args = ap.parse_args(argv)

    from zutis_tpu.core.cache import enable_compilation_cache
    from zutis_tpu.ops.tome import merge_schedule

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    batches = [int(b) for b in args.batches.split(",")]
    rows = []
    r0_rate = None
    for r in [int(r) for r in args.rs.split(",")]:
        sched = merge_schedule(577, r, 12)
        rate, bb = measure_r(rng, r, batches)
        if r == 0:
            r0_rate = rate
        rows.append({
            "r": r,
            "tokens_final": 577 - sum(sched),
            "img_per_sec": round(rate, 1),
            "best_batch": bb,
            "vs_r0": round(rate / r0_rate, 3) if r0_rate else None,
        })
        print(json.dumps(rows[-1]), flush=True)
    with open(args.out, "w") as f:
        json.dump({"image_size": 384, "arch": "ViT-B/16",
                   "rows": rows}, f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
    import os

    os._exit(0)  # skip jax teardown (can hang under the tunnel)
