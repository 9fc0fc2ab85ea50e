#!/bin/bash
# FINDING (kept for the record, PERF.md r4 addendum): the tunnel's
# remote-compile REJECTS client-side TPU-only XLA_FLAGS — the terminal's
# flags win — so the non-baseline rows of this sweep never actually apply
# their flags in this environment. Do not read them as "flags don't help";
# re-run on a directly-attached TPU host to get real numbers.
# Dense-bench XLA flag sweep (VERDICT r3 task 2): XLA_FLAGS are process-
# level, so each config measures the bench program (batch 64 only) in its
# own process. Results print one JSON line per config; an invalid flag
# fails only its own config.
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
run() {
  name="$1"; flags="$2"
  echo "=== $name: $flags"
  XLA_FLAGS="$flags" timeout 1200 python - <<'EOF'
import json
import numpy as np
import jax.numpy as jnp
from tools.bench_variants import build_model, build_infer, measure
from zutis_tpu.core.cache import enable_compilation_cache
import jax
enable_compilation_cache()
rng = np.random.RandomState(0)
model = build_model()
x0 = jnp.asarray(rng.randn(1, 3, 384, 384).astype(np.float32))
params = model.init(jax.random.PRNGKey(0), x0)["params"]
params = jax.tree.map(
    lambda v: v.astype(jnp.bfloat16) if v.ndim > 1 else v, params)
text = rng.randn(919, 512).astype(np.float32)
text = jnp.asarray(text / np.linalg.norm(text, axis=1, keepdims=True))
x = jnp.asarray(rng.randn(64, 3, 384, 384).astype(np.float32))
infer = build_infer(model, params, text, False)
print(json.dumps({"img_per_sec": round(measure(infer, params, x, 64), 1)}),
      flush=True)
import os, sys
sys.stdout.flush(); os._exit(0)
EOF
}
run baseline ""
run vmem64 "--xla_tpu_scoped_vmem_limit_kib=65536"
run vmem96 "--xla_tpu_scoped_vmem_limit_kib=98304"
run lhs "--xla_tpu_enable_latency_hiding_scheduler=true"
