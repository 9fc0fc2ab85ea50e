"""Probe: separate per-iteration dispatch/tunnel overhead from device time in
the bench program. Times the jitted bench forward at batch 64 for several
iteration counts (fixed overhead shows up as intercept) and times a trivial
program's dispatch for the tunnel's floor.

Usage: timeout 600 python tools/dispatch_probe.py
"""
from __future__ import annotations

import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from zutis_tpu.core.cache import enable_compilation_cache
    from zutis_tpu.models import ZUTIS

    enable_compilation_cache()

    # tunnel floor: tiny jitted program, forced fetch
    @jax.jit
    def tiny(a):
        return jnp.sum(a * 2.0)

    a = jnp.ones((128,))
    float(tiny(a))
    for n in (10, 50):
        t0 = time.perf_counter()
        for _ in range(n):
            r = tiny(a)
        float(r)
        dt = (time.perf_counter() - t0) / n
        print(f"tiny dispatch x{n}: {dt * 1e3:.2f} ms/call")

    image_size, n_cat = 384, 919
    model = ZUTIS(
        width=768, encoder_layers=12, encoder_heads=12, patch_size=16,
        text_dim=512, n_queries=100, n_decoder_layers=6, n_heads=8,
        input_resolution=224, dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    init_x = jnp.asarray(rng.randn(1, 3, image_size, image_size)
                         .astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), init_x)["params"]
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.ndim > 1 else x, params)
    text = rng.randn(n_cat, 512).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=1, keepdims=True))

    @jax.jit
    def infer(p, image):
        out = model.apply({"params": p}, image, inference=True)
        logits = jnp.einsum(
            "nc,bhwc->bnhw", text, out["patch_tokens"],
            preferred_element_type=jnp.float32,
        )
        sem = jnp.argmax(logits, axis=1)
        obj = jnp.max(out["mask_proposals"][:, -1], axis=(-2, -1))
        return sem, obj

    batch = 64
    x = jnp.asarray(
        rng.randn(batch, 3, image_size, image_size).astype(np.float32))
    sem, obj = infer(params, x)
    float(jnp.sum(obj))

    # python-side dispatch cost alone (no waiting): time the loop body
    t0 = time.perf_counter()
    for _ in range(5):
        sem, obj = infer(params, x)
    t_dispatch = (time.perf_counter() - t0) / 5
    float(jnp.sum(obj))
    print(f"python dispatch only: {t_dispatch * 1e3:.2f} ms/call")

    for n in (4, 12, 36):
        t0 = time.perf_counter()
        for _ in range(n):
            sem, obj = infer(params, x)
        float(jnp.sum(obj)) + float(jnp.sum(sem))
        dt = (time.perf_counter() - t0) / n
        print(f"bench fwd x{n}: {dt * 1e3:.2f} ms/iter "
              f"({batch / dt:.1f} img/s)")

    # does a fresh input per iter change anything (device_put in loop)?
    xs = [jnp.asarray(rng.randn(batch, 3, image_size, image_size)
                      .astype(np.float32)) for _ in range(4)]
    t0 = time.perf_counter()
    for i in range(12):
        sem, obj = infer(params, xs[i % 4])
    float(jnp.sum(obj))
    dt = (time.perf_counter() - t0) / 12
    print(f"bench fwd rotating inputs x12: {dt * 1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()
