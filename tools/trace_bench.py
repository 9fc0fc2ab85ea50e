"""Capture a jax.profiler device trace of the bench forward and print the top
ops by self-time (parsed from the xplane with tensorboard_plugin_profile).

Usage: timeout 600 python tools/trace_bench.py [batch] [outdir] [tome_r]
"""
from __future__ import annotations

import glob
import sys

import numpy as np


def capture(batch: int, outdir: str, tome_r: int = 0) -> None:
    import jax
    import jax.numpy as jnp
    from zutis_tpu.core.cache import enable_compilation_cache
    from zutis_tpu.models import ZUTIS

    enable_compilation_cache()
    image_size, n_cat = 384, 919
    model = ZUTIS(
        width=768, encoder_layers=12, encoder_heads=12, patch_size=16,
        text_dim=512, n_queries=100, n_decoder_layers=6, n_heads=8,
        input_resolution=224, dtype=jnp.bfloat16, tome_r=tome_r,
    )
    rng = np.random.RandomState(0)
    init_x = jnp.asarray(rng.randn(1, 3, image_size, image_size)
                         .astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), init_x)["params"]
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.ndim > 1 else x, params)
    text = rng.randn(n_cat, 512).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=1, keepdims=True))
    x = jnp.asarray(
        rng.randn(batch, 3, image_size, image_size).astype(np.float32))

    @jax.jit
    def full(p, image):
        out = model.apply({"params": p}, image, inference=True)
        logits = jnp.einsum("nc,bhwc->bnhw", text, out["patch_tokens"],
                            preferred_element_type=jnp.float32)
        sem = jnp.argmax(logits, axis=1)
        obj = jnp.max(out["mask_proposals"][:, -1], axis=(-2, -1))
        return sem.astype(jnp.float32).sum() + obj.sum()

    float(full(params, x))  # compile + warm
    with jax.profiler.trace(outdir):
        for _ in range(3):
            out = full(params, x)
        float(out)
    print("TRACE_DONE", flush=True)


def report(outdir: str, top: int = 40) -> None:
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xplanes = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
    print("xplanes:", xplanes)
    if not xplanes:
        return
    data, _ = rtd.xspace_to_tool_data(xplanes, "framework_op_stats", {})
    import gzip
    import io
    import csv
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data).decode()
        except OSError:
            data = data.decode()
    rows = list(csv.reader(io.StringIO(data)))
    print(f"ROWS {len(rows)}")
    for r in rows[:top]:
        print(r)


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/jax_trace"
    tome_r = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    capture(batch, outdir, tome_r)
    report(outdir)
