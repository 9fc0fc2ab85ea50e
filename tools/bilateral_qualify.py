"""Qualify the device bilateral solver against the host scipy path
(VERDICT r4 task 6: pick the data/pseudo_masks.py default by measurement,
the way attention was qualified in PALLAS_QUALIFY.json).

Workload: the pseudo-labeling refinement shape (reference
utils/bilateral_solver.py:152-195 semantics, pinned by
tests/test_bilateral_device.py) — 512px-shorter-side RGB images with a
SelfMask-style soft mask, the exact call data/pseudo_masks.py makes per
image (500 imgs/category x hundreds of categories at scale).

Measures per-image wall time of
  * host:   ops/bilateral.bilateral_solver_output (scipy CG; the default)
  * device: ops/bilateral_device.bilateral_solver_output_device (jitted
            grid CG + flood-fill), excluding compile, forced fetches
and the agreement (IoU of refined masks) between the two.

On TPU the device path pays the tunnel's D2H per call; the table records
both the in-process wall and the device-only rate so the deployment
decision is explicit.

Usage:
  CPU:  env PYTHONPATH= JAX_PLATFORMS=cpu python tools/bilateral_qualify.py
  TPU:  PYTHONPATH=/root/.axon_site:/root/repo python \
            tools/bilateral_qualify.py --out BILATERAL_QUALIFY.json
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_case(rng, h, w):
    """Synthetic photo-like image + blobby soft mask (the solver input
    regime: piecewise-smooth colour regions, soft [0,1] target)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 3), np.float32)
    for _ in range(6):  # smooth colour blobs
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        s = rng.uniform(0.1, 0.4) * min(h, w)
        g = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
        img += g[..., None] * rng.uniform(40, 215, 3)
    img = np.clip(img + rng.normal(0, 6, img.shape), 0, 255)
    cy, cx = h * rng.uniform(0.35, 0.65), w * rng.uniform(0.35, 0.65)
    ry, rx = h * rng.uniform(0.15, 0.3), w * rng.uniform(0.15, 0.3)
    soft = 1.0 / (1.0 + np.exp(
        (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 - 1.0) * 4.0))
    return img.astype(np.uint8), soft.astype(np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--hw", type=str, default="512x640")
    ap.add_argument("--out", type=str, default="BILATERAL_QUALIFY.json")
    args = ap.parse_args(argv)
    h, w = (int(v) for v in args.hw.split("x"))

    import jax
    import jax.numpy as jnp

    from zutis_tpu.ops.bilateral import bilateral_solver_output
    from zutis_tpu.ops.bilateral_device import bilateral_solver_output_device

    rng = np.random.RandomState(0)
    cases = [make_case(rng, h, w) for _ in range(args.n)]

    # host path
    host_masks, t_host = [], 0.0
    for img, soft in cases:
        t0 = time.perf_counter()
        _, refined = bilateral_solver_output(img, soft.astype(np.float64))
        t_host += time.perf_counter() - t0
        host_masks.append(np.asarray(refined, bool))

    # device path: jit once per shape, compile excluded, forced fetch
    # (block_until_ready can lie under the tunnel — CLAUDE.md)
    solve = jax.jit(lambda i, t: bilateral_solver_output_device(i, t)[1])
    img0 = jnp.asarray(cases[0][0], jnp.float32)
    t0 = time.perf_counter()
    _ = int(jnp.sum(solve(img0, jnp.asarray(cases[0][1]))))
    compile_s = time.perf_counter() - t0
    dev_masks, t_dev = [], 0.0
    for img, soft in cases:
        ij = jnp.asarray(img, jnp.float32)
        tj = jnp.asarray(soft)
        t0 = time.perf_counter()
        out = solve(ij, tj)
        _ = int(jnp.sum(out))  # forced fetch inside the timed region
        t_dev += time.perf_counter() - t0
        dev_masks.append(np.asarray(out).astype(bool))

    ious = []
    for a, b in zip(host_masks, dev_masks):
        inter, union = (a & b).sum(), (a | b).sum()
        ious.append(float(inter) / union if union else 1.0)

    report = {
        "backend": jax.default_backend(),
        "shape": [h, w],
        "n_images": args.n,
        "host_ms_per_image": round(1000 * t_host / args.n, 1),
        "device_ms_per_image": round(1000 * t_dev / args.n, 1),
        "device_compile_s": round(compile_s, 1),
        "mask_iou_host_vs_device": [round(i, 4) for i in ious],
        "mean_iou": round(float(np.mean(ious)), 4),
    }
    print(json.dumps(report, indent=2), flush=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
    import os

    os._exit(0)  # skip jax teardown (can hang under the tunnel)
