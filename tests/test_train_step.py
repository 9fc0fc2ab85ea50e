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


def test_confusion_acc_threading_matches_sum():
    """train_step(confusion_acc=...) returns acc + this step's histogram —
    fit's step-fused device accumulation must equal summing the per-step
    histograms (and params/loss must be unaffected by the extra arg)."""
    model, params, batch, text, n_cat = tiny_setup()
    tx = make_optimizer(base_lr=1e-3, n_iters=1000)
    step = make_train_step(model, tx, text, n_cat)

    # the step donates its TrainState, so each run needs its own buffers
    fresh = lambda: jax.tree_util.tree_map(jnp.array, params)  # noqa: E731

    state_a = TrainState.create(fresh(), tx)
    per_step_sum = np.zeros((n_cat, n_cat), np.float64)
    losses_a = []
    for _ in range(4):
        state_a, m = step(state_a, batch)
        per_step_sum += np.asarray(m["confusion"])
        losses_a.append(float(m["loss"]))

    state_b = TrainState.create(fresh(), tx)
    acc = jnp.zeros((n_cat, n_cat), jnp.float32)
    losses_b = []
    for _ in range(4):
        state_b, m = step(state_b, batch, acc)
        acc = m["confusion"]
        losses_b.append(float(m["loss"]))

    np.testing.assert_array_equal(per_step_sum, np.asarray(acc))
    np.testing.assert_array_equal(losses_a, losses_b)
    leaves_a = jax.tree_util.tree_leaves(state_a.params)
    leaves_b = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_metrics_match_synchronous_accumulation():
    """Trainer.fit's lag-2 pipeline + device confusion accumulator produce
    the same RunningScore confusion and mean loss as a synchronous step
    loop (the r3 fit body)."""
    from zutis_tpu.engine.trainer import Trainer

    model, params, batch, text, n_cat = tiny_setup()
    tx = make_optimizer(base_lr=1e-3, n_iters=1000)
    fresh = lambda: jax.tree_util.tree_map(jnp.array, params)  # noqa: E731

    # synchronous oracle
    state = TrainState.create(fresh(), tx)
    step = make_train_step(model, tx, text, n_cat)
    for _ in range(5):
        state, m = step(state, batch)

    def batches():
        while True:
            yield batch

    trainer = Trainer(model, text)
    state_f = trainer.fit(TrainState.create(fresh(), tx), tx, batches(),
                          n_iters=5, n_categories=n_cat)
    # the params trajectory must match the synchronous loop exactly
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state_f.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state_f.step) == 5
