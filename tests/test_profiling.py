"""Profiler hooks + numeric guards (SURVEY.md section 5 tracing row)."""
import glob
import os

import numpy as np
import pytest

import jax.numpy as jnp

from zutis_tpu.core import profiling as prof


def test_trace_writes_artifacts(tmp_path):
    with prof.trace(str(tmp_path)):
        with prof.annotate("matmul"):
            x = jnp.ones((64, 64))
            (x @ x).block_until_ready()
    files = glob.glob(str(tmp_path / "**" / "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), "no trace artifacts written"


def test_check_finite_raises_with_path():
    tree = {"a": np.ones(3), "b": {"c": np.array([1.0, np.nan])}}
    with pytest.raises(prof.NonFiniteError, match="b/c"):
        prof.check_finite(tree, where="unit-test")
    prof.check_finite({"a": np.ones(2), "i": np.arange(3)}, "ok")


def test_trainer_raises_on_nan_loss():
    from zutis_tpu.engine.optim import make_optimizer
    from zutis_tpu.engine.trainer import Trainer
    from zutis_tpu.engine.train_step import TrainState
    from zutis_tpu.models.zutis import ZUTIS

    model = ZUTIS(width=32, encoder_layers=1, encoder_heads=2, patch_size=16,
                  text_dim=16, n_queries=4, n_decoder_layers=1, n_heads=2,
                  input_resolution=32)
    text = np.eye(3, 16, dtype=np.float32)
    trainer = Trainer(model, jnp.asarray(text))
    tx = make_optimizer(base_lr=1e-3, n_iters=4)
    import jax
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, 32, 32)))["params"]
    state = TrainState.create(params, tx)

    def batches():
        while True:
            yield {
                # NaN image poisons the loss on step 1
                "image": jnp.full((1, 3, 32, 32), jnp.nan),
                "instance_masks": jnp.ones((1, 2, 32, 32)),
                "instance_valid": jnp.ones((1, 2), bool),
                "semantic_mask": jnp.zeros((1, 32, 32), jnp.int32),
            }

    with pytest.raises(prof.NonFiniteError, match="step 1"):
        trainer.fit(state, tx, batches(), n_iters=2, n_categories=3)


def test_check_finite_catches_bfloat16_nan():
    """numpy classifies ml_dtypes.bfloat16 as kind 'V' (not np.floating), so
    an np-based dtype test silently skipped leaves in the project's own TPU
    compute dtype."""
    bad = {"loss": jnp.asarray(float("nan"), jnp.bfloat16)}
    with pytest.raises(prof.NonFiniteError, match="loss"):
        prof.check_finite(bad, where="bf16-test")
    prof.check_finite({"ok": jnp.asarray(1.5, jnp.bfloat16)}, "ok")
