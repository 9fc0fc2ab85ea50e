"""Segment-level timing of the bench program on the real TPU (round-3 perf
work; VERDICT r2 task 1). Each segment is a separately jitted prefix of the
honest bench forward; deltas between successive prefixes attribute wall-clock
to pipeline stages. Forced fetches only (block_until_ready lies under the
axon tunnel — CLAUDE.md).

Usage:  timeout 600 python tools/bench_profile.py [batch] [--bf16-params]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    bf16_params = "--bf16-params" in sys.argv

    import jax
    import jax.numpy as jnp
    from zutis_tpu.core.cache import enable_compilation_cache
    from zutis_tpu.models import ZUTIS

    enable_compilation_cache()

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
    if bf16_params:
        # pre-cast everything except LayerNorm scale/bias (f32 statistics)
        def cast(path, x):
            name = "/".join(str(p.key) for p in path)
            if "LayerNorm" in name or x.ndim == 1:
                return x
            return x.astype(jnp.bfloat16)
        params = jax.tree_util.tree_map_with_path(cast, params)
    text = rng.randn(n_cat, 512).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=1, keepdims=True))
    x = jnp.asarray(
        rng.randn(batch, 3, image_size, image_size).astype(np.float32))

    def enc_only(p, image):
        toks, h, w = model.apply({"params": p}, image,
                                 method=lambda m, im: m.encoder(im))
        return toks

    def full(p, image):
        out = model.apply({"params": p}, image, inference=True)
        logits = jnp.einsum("nc,bhwc->bnhw", text, out["patch_tokens"],
                            preferred_element_type=jnp.float32)
        sem = jnp.argmax(logits, axis=1)
        obj = jnp.max(out["mask_proposals"][:, -1], axis=(-2, -1))
        return sem.astype(jnp.float32).sum() + obj.sum()

    def fwd_only(p, image):
        out = model.apply({"params": p}, image, inference=True)
        return (out["patch_tokens"].sum()
                + out["mask_proposals"][:, -1].max(axis=(-2, -1)).sum())

    segs = {
        "encoder": lambda p, im: enc_only(p, im).astype(jnp.float32).sum(),
        "forward": fwd_only,
        "full+argmax": full,
    }
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--seg=")]
    if only:
        segs = {k: v for k, v in segs.items() if k.startswith(only[0])}

    for name, fn in segs.items():
        jfn = jax.jit(fn)
        out = jfn(params, x)
        float(out)  # warm + force
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            out = jfn(params, x)
        float(out)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"SEG {name:14s} {ms:8.2f} ms  "
              f"({batch / (ms / 1e3):7.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
