"""Capture a jax.profiler device trace of the TRAINING step at the
reference ImageNet-S config shapes (the bench.py line-2 program) and print
the top ops by self-time via tools/trace_report.py.

Usage: timeout 900 python tools/trace_train.py [outdir]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_train"

    import jax
    import jax.numpy as jnp
    from zutis_tpu.core.cache import enable_compilation_cache
    from zutis_tpu.engine.optim import make_optimizer
    from zutis_tpu.engine.train_step import TrainState, make_train_step
    from zutis_tpu.models import ZUTIS

    enable_compilation_cache()
    batch, image_size, n_cat, n_max = 8, 384, 919, 10
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
    text = jnp.asarray(text / np.linalg.norm(text, axis=1, keepdims=True))
    tx = make_optimizer(base_lr=5e-5, n_iters=80_000)
    state = TrainState.create(params, tx)
    step_fn = make_train_step(model, tx, text, n_categories=n_cat,
                              ignore_index=1000)

    sem = rng.randint(0, n_cat, (batch, image_size, image_size))
    masks = (rng.rand(batch, n_max, image_size, image_size) > 0.7)
    batch_data = {
        "image": jnp.asarray(
            rng.randn(batch, 3, image_size, image_size).astype(np.float32)),
        "instance_masks": jnp.asarray(masks.astype(np.float32)),
        "instance_valid": jnp.asarray(
            np.arange(n_max)[None] < 4, dtype=bool).repeat(batch, axis=0),
        "semantic_mask": jnp.asarray(sem.astype(np.int32)),
    }
    state, metrics = step_fn(state, batch_data)
    float(metrics["loss"])
    # warm window (fresh-executable transient)
    for _ in range(6):
        state, metrics = step_fn(state, batch_data)
    float(metrics["loss"])

    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        state, metrics = step_fn(state, batch_data)
    float(metrics["loss"])
    print(f"steady: {(time.perf_counter() - t0) / n * 1e3:.1f} ms/step",
          flush=True)

    if outdir != "none":
        jax.profiler.start_trace(outdir)
        for _ in range(3):
            state, metrics = step_fn(state, batch_data)
        float(metrics["loss"])
        jax.profiler.stop_trace()
        print(f"trace written to {outdir}", flush=True)


if __name__ == "__main__":
    main()
