"""Capture a jax.profiler device trace of the INSTANCE-EVAL device program
(padded forward + decode + NMS + device RLE + blob pack) at the 512x640
bucket and print the top ops by self-time — the same treatment the dense
bench got in round 3 (VERDICT r3 task 3: "first commit the per-op trace").

Usage: timeout 900 python tools/trace_instance.py [batch] [outdir]
Report: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
            PYTHONPATH=/root/.axon_site:/root/repo python tools/trace_report.py <outdir>
"""
from __future__ import annotations

import sys

import numpy as np


def capture(batch: int, outdir: str) -> None:
    import jax
    import jax.numpy as jnp
    from zutis_tpu.core.cache import enable_compilation_cache
    from zutis_tpu.engine import batched_eval as BE
    from zutis_tpu.models import ZUTIS

    enable_compilation_cache()
    shape = (512, 640)
    model = ZUTIS(
        width=768, encoder_layers=12, encoder_heads=12, patch_size=16,
        text_dim=512, n_queries=100, n_decoder_layers=6, n_heads=8,
        input_resolution=224, dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    n_cat = 81
    init_x = jnp.asarray(rng.randn(1, 3, 224, 224).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), init_x)["params"]
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.ndim > 1 else x, params)
    text = rng.randn(n_cat, 512).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=1, keepdims=True))

    step = BE.make_instance_step(model, text, shape, semantic_mode="none")

    sizes = [(480 + 8 * (i % 5), 640 - 16 * (i % 3)) for i in range(batch)]
    images = [rng.randn(3, h, w).astype(np.float32) * 0.1
              for (h, w) in sizes]
    padded, native_grid, native_pixels = BE.pad_batch(
        images, shape, batch, model.patch_size)
    padded_d = jnp.asarray(padded)
    grid_d = jnp.asarray(native_grid)
    pix_d = jnp.asarray(native_pixels)

    dev = step(params, padded_d, grid_d, pix_d)  # compile + warm
    float(jnp.sum(dev["host_blob"]))
    # warm a full window: a fresh executable's first ~18 dispatches run
    # ~20% slow under the tunnelled runtime (CLAUDE.md)
    for _ in range(6):
        dev = step(params, padded_d, grid_d, pix_d)
    float(jnp.sum(dev["host_blob"]))
    with jax.profiler.trace(outdir):
        for _ in range(3):
            dev = step(params, padded_d, grid_d, pix_d)
        float(jnp.sum(dev["host_blob"]))
    print("TRACE_DONE", flush=True)


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/jax_trace_instance"
    capture(batch, outdir)
