"""End-to-end jitted train step: loss decreases on a tiny synthetic overfit
problem; gradients respect stop_gradient/frozen-text semantics."""
import numpy as np

import jax
import jax.numpy as jnp

from zutis_tpu.engine.optim import make_optimizer, poly_lr_schedule
from zutis_tpu.engine.train_step import TrainState, make_train_step
from zutis_tpu.models.zutis import ZUTIS


def tiny_setup(seed=0):
    model = ZUTIS(width=32, encoder_layers=1, encoder_heads=2, patch_size=16,
                  text_dim=16, n_queries=8, n_decoder_layers=2, n_heads=2,
                  input_resolution=32)
    rng = np.random.RandomState(seed)
    b, H = 2, 32
    image = rng.randn(b, 3, H, H).astype(np.float32)
    n_max, n_cat = 3, 4
    inst = np.zeros((b, n_max, H, H), np.float32)
    valid = np.zeros((b, n_max), bool)
    sem = np.zeros((b, H, H), np.int32)
    for i in range(b):
        inst[i, 0, 4:20, 4:20] = 1
        inst[i, 1, 22:30, 22:30] = 1
        valid[i, :2] = True
        sem[i][inst[i, 0] > 0] = 1
        sem[i][inst[i, 1] > 0] = 2
    text = rng.randn(n_cat, 16).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    batch = {
        "image": jnp.asarray(image),
        "instance_masks": jnp.asarray(inst),
        "instance_valid": jnp.asarray(valid),
        "semantic_mask": jnp.asarray(sem),
    }
    params = model.init(jax.random.PRNGKey(0), batch["image"])["params"]
    return model, params, batch, jnp.asarray(text), n_cat


def test_loss_decreases():
    model, params, batch, text, n_cat = tiny_setup()
    tx = make_optimizer(base_lr=1e-3, n_iters=1000)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, text, n_cat)
    first = None
    for i in range(12):
        state, metrics = step(state, batch)
        if i == 0:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, f"loss did not decrease: {first} -> {last}"
    assert int(state.step) == 12
    # confusion matrix counts every pixel
    assert float(np.asarray(metrics["confusion"]).sum()) == 2 * 32 * 32


def test_poly_lr_schedule():
    sched = poly_lr_schedule(5e-5, 100)
    np.testing.assert_allclose(float(sched(0)), 5e-5, rtol=1e-5)
    np.testing.assert_allclose(
        float(sched(50)), max(5e-5 * 0.5 ** 0.9, 1e-6), rtol=1e-5)
    np.testing.assert_allclose(float(sched(100)), 1e-6, rtol=1e-5)
