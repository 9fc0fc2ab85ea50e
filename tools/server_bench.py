"""Measure the serving path (VERDICT r4 task 7: engine/server.py has no
perf artifact; replace its docstring claim with a measurement).

Two numbers, clearly separated:
  * device_rate: the server's OWN compiled step (forward + on-device
    instance decode + NMS) timed like bench.py (forced fetch, warm
    window) — the per-chip serving capacity;
  * e2e_rate: submit()->result() throughput through the full queue/worker/
    RLE-assembly path. Under the development tunnel this is transport-bound
    (~30 MB/s H2D, CLAUDE.md) and says nothing about a TPU-VM deployment;
    the uint8 row ships 4x less and bounds the transport effect.

Usage:
  TPU:  PYTHONPATH=/root/.axon_site:/root/repo python tools/server_bench.py
  CPU smoke: env PYTHONPATH= JAX_PLATFORMS=cpu python tools/server_bench.py \
                 --tiny --n 16 --out /tmp/server_bench.json
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build(tiny: bool, batch_size: int, uint8: bool, tome_r: int = 0,
          decoder_pool: int = 1):
    import jax
    import jax.numpy as jnp

    from zutis_tpu.engine.server import InferenceServer
    from zutis_tpu.models import ZUTIS

    if tiny:
        size, n_cat = 64, 4
        model = ZUTIS(width=64, encoder_layers=2, encoder_heads=4,
                      patch_size=16, text_dim=32, n_queries=16,
                      n_decoder_layers=2, n_heads=4, input_resolution=32)
    else:
        size, n_cat = 384, 919
        model = ZUTIS(width=768, encoder_layers=12, encoder_heads=12,
                      patch_size=16, text_dim=512, n_queries=100,
                      n_decoder_layers=6, n_heads=8, input_resolution=224,
                      dtype=jnp.bfloat16, tome_r=tome_r,
                      decoder_pool=decoder_pool)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(1, 3, size, size).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x0)["params"]
    if not tiny:
        params = jax.tree.map(
            lambda v: v.astype(jnp.bfloat16) if v.ndim > 1 else v, params)
    text = rng.randn(n_cat, model.text_dim).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    srv = InferenceServer(model, params, jnp.asarray(text), image_size=size,
                          batch_size=batch_size, uint8_transport=uint8)
    return srv, size, rng


def device_rate(srv, size, rng, batch_size, uint8, n_iters=18):
    """The server's compiled step alone — bench.py measurement discipline."""
    import jax.numpy as jnp

    if uint8:
        x = jnp.asarray(rng.randint(0, 255, (batch_size, 3, size, size),
                                    dtype=np.uint8))
    else:
        x = jnp.asarray(
            rng.randn(batch_size, 3, size, size).astype(np.float32))
    out = srv._step(srv._params, srv._text, x)  # compile
    float(jnp.sum(out["scores"]))
    for _ in range(n_iters):  # warm a full window (tunnel dispatch quirk)
        out = srv._step(srv._params, srv._text, x)
    float(jnp.sum(out["scores"]))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = srv._step(srv._params, srv._text, x)
        float(jnp.sum(out["scores"])) + float(jnp.sum(out["semantic"]))
        best = max(best, batch_size * n_iters / (time.perf_counter() - t0))
    return best


def e2e_rate(srv, size, rng, n_requests, uint8):
    if uint8:
        reqs = [rng.randint(0, 255, (3, size, size), dtype=np.uint8)
                for _ in range(n_requests)]
    else:
        reqs = [rng.randn(3, size, size).astype(np.float32)
                for _ in range(n_requests)]
    srv.start()
    try:
        # warm: one full batch through the worker (compile + first window)
        for f in [srv.submit(r) for r in reqs[:srv.batch_size]]:
            f.result(timeout=600)
        t0 = time.perf_counter()
        futs = [srv.submit(r) for r in reqs]
        results = [f.result(timeout=600) for f in futs]
        dt = time.perf_counter() - t0
    finally:
        srv.stop()
    assert len(results) == n_requests
    n_inst = sum(len(r["instances"]) for r in results)
    return n_requests / dt, n_inst


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--out", type=str, default="SERVER_BENCH.json")
    # opt-in throughput levers (full-size model only; PERF.md round-5)
    ap.add_argument("--tome_r", type=int, default=0)
    ap.add_argument("--decoder_pool", type=int, default=1)
    args = ap.parse_args(argv)

    import jax

    from zutis_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    rows = []
    for uint8 in (False, True):
        srv, size, rng = build(args.tiny, args.batch, uint8,
                               tome_r=args.tome_r,
                               decoder_pool=args.decoder_pool)
        dev = device_rate(srv, size, rng, args.batch, uint8)
        e2e, n_inst = e2e_rate(srv, size, rng, args.n, uint8)
        rows.append({
            "transport": "uint8" if uint8 else "float32",
            "device_img_per_sec": round(dev, 1),
            "e2e_img_per_sec": round(e2e, 1),
            "mb_per_image": round(
                3 * size * size * (1 if uint8 else 4) / 1e6, 2),
            "n_instances_emitted": n_inst,
        })
        print(json.dumps(rows[-1]), flush=True)
    report = {"backend": jax.default_backend(),
              "batch_size": args.batch, "tiny": args.tiny,
              "tome_r": args.tome_r, "decoder_pool": args.decoder_pool,
              "rows": rows}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
    import os

    os._exit(0)  # skip jax teardown (can hang under the tunnel)
