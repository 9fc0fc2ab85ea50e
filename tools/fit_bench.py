"""Trainer.fit end-to-end throughput at the reference ImageNet-S config.

bench.py's `measure_train` times the jitted step with one forced fetch per
window — the DEVICE rate (8.66 it/s as of r4). The production loop is
`Trainer.fit` (reference `/root/reference/trainer.py:105-253`), which also
meters loss and accumulates the [C,C] confusion histogram every step; its
r3-era body blocked on a loss fetch + a 3.4 MB confusion fetch per step,
serialising ~30+ ms of tunnel D2H against every 115 ms device step. This
tool measures fit's WALL rate so the loop overhead over the device rate is
a committed number rather than a guess (PERF.md "fit pipeline" section).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/fit_bench.py
       [--iters 60] [--warm 25] [--iter-log 0]
"""
import argparse
import json
import os
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--warm", type=int, default=25,
                    help="untimed leading steps (fresh-executable transient "
                         "runs ~15-20%% slow; see PERF.md dispatch notes)")
    ap.add_argument("--iter-log", type=int, default=0,
                    help="log every N steps inside the timed window "
                         "(0 = never); exercises the drain-at-log path")
    # opt-in throughput levers (models/zutis.py; gradients flow through
    # both — tests/test_tome.py, tests/test_decoder_pool.py)
    ap.add_argument("--tome_r", type=int, default=0)
    ap.add_argument("--decoder_pool", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from zutis_tpu.core.cache import enable_compilation_cache
    from zutis_tpu.engine.optim import make_optimizer
    from zutis_tpu.engine.train_step import TrainState
    from zutis_tpu.engine.trainer import Trainer
    from zutis_tpu.models import ZUTIS

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    batch, image_size, n_cat, n_max = 8, 384, 919, 10
    model = ZUTIS(
        width=768, encoder_layers=12, encoder_heads=12, patch_size=16,
        text_dim=512, n_queries=100, n_decoder_layers=6, n_heads=8,
        input_resolution=224, dtype=jnp.bfloat16, tome_r=args.tome_r,
        decoder_pool=args.decoder_pool,
    )
    init_x = jnp.asarray(rng.randn(1, 3, image_size, image_size)
                         .astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), init_x)["params"]
    text = rng.randn(n_cat, 512).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=1, keepdims=True))
    tx = make_optimizer(base_lr=5e-5, n_iters=80_000)
    state = TrainState.create(params, tx)
    trainer = Trainer(model, text)

    sem = rng.randint(0, n_cat, (batch, image_size, image_size))
    masks = (rng.rand(batch, n_max, image_size, image_size) > 0.7)
    batch_data = {
        "image": jnp.asarray(
            rng.randn(batch, 3, image_size, image_size).astype(np.float32)),
        "instance_masks": jnp.asarray(masks.astype(np.float32)),
        "instance_valid": jnp.asarray(
            np.arange(n_max)[None] < 4, dtype=bool
        ).repeat(batch, axis=0),
        "semantic_mask": jnp.asarray(sem.astype(np.int32)),
    }

    def batches():
        while True:
            yield batch_data

    print("compiling + warm fit...", file=sys.stderr, flush=True)
    t_c = time.perf_counter()
    state = trainer.fit(state, tx, batches(), n_iters=args.warm,
                        n_categories=n_cat, ignore_index=1000)
    print(f"warm fit ({args.warm} iters): "
          f"{time.perf_counter() - t_c:.1f}s", file=sys.stderr, flush=True)

    n_total = args.warm + args.iters
    t0 = time.perf_counter()
    state = trainer.fit(state, tx, batches(), n_iters=n_total,
                        n_categories=n_cat, ignore_index=1000,
                        iter_log=args.iter_log or None)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "trainer_fit_its_per_sec",
        "value": round(args.iters / dt, 2),
        "iters": args.iters,
        "iter_log": args.iter_log,
        "unit": "iters/sec (batch 8, 384px, ref config, Trainer.fit wall)",
    }), flush=True)
    sys.stdout.flush()
    # skip jax runtime teardown: a hang here + timeout-kill wedges the
    # tunnel for the next process (same hazard bench.py documents)
    os._exit(0)


if __name__ == "__main__":
    main()
