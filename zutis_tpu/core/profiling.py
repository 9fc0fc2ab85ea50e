"""Tracing/profiling and numeric-guard hooks (SURVEY.md section 5: the
reference has neither — only tqdm postfix strings and CUDA_LAUNCH_BLOCKING).

  - `trace(dir)`: context manager around jax.profiler for a Perfetto/
    TensorBoard trace of the enclosed steps; `Trainer.fit(profile_dir=...)`
    traces a window of training steps with it.
  - `annotate(name)`: TraceAnnotation passthrough for labelling host-side
    phases inside a trace.
  - `enable_debug_nans()`: flips jax_debug_nans (CI hook; raises on the
    first NaN-producing op instead of propagating).
  - `check_finite(tree, where)`: host-side guard over a fetched pytree —
    cheap (runs on already-fetched metrics), raises with the offending leaf
    path. (The train loop's per-step loss guard raises NonFiniteError
    directly in engine/trainer.py's drain; this helper serves ad-hoc
    pytree checks and tests.)
"""
from __future__ import annotations

import contextlib
from typing import Iterator

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def enable_debug_nans(on: bool = True) -> None:
    jax.config.update("jax_debug_nans", on)


class NonFiniteError(RuntimeError):
    pass


def check_finite(tree, where: str = "") -> None:
    import jax.numpy as jnp

    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for keypath, leaf in flat:
        arr = np.asarray(leaf)
        # jnp.issubdtype (not np.) — numpy classifies ml_dtypes.bfloat16 as
        # kind 'V', so an np.floating test silently SKIPS leaves in the
        # project's own TPU compute dtype
        if not jnp.issubdtype(arr.dtype, jnp.floating):
            continue
        if arr.dtype.kind != "f":  # extended floats: upcast for isfinite
            arr = arr.astype(np.float32)
        if not np.all(np.isfinite(arr)):
            path = "/".join(
                k.key if hasattr(k, "key") else str(k) for k in keypath)
            raise NonFiniteError(
                f"non-finite value at {where or 'unknown'}: leaf {path!r}")
