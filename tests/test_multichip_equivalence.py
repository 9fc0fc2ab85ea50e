"""DP x TP sharded training == single-device training, numerically
(VERDICT round-1 item 6; SURVEY.md section 4 multi-chip test plan).

GSPMD partitioning must only change data layout, never the math: two train
steps of a tiny ZUTIS on a 2x4 (data x model) mesh produce the same params
and metrics as two single-device steps on identical inputs."""
import numpy as np

import jax
import jax.numpy as jnp

from zutis_tpu.engine.optim import make_optimizer
from zutis_tpu.engine.train_step import TrainState, make_train_step
from zutis_tpu.models import ZUTIS
from zutis_tpu.parallel import create_mesh, shard_batch, shard_params
from zutis_tpu.parallel.mesh import replicate


def test_dp_tp_train_step_matches_single_device():
    model = ZUTIS(width=64, encoder_layers=2, encoder_heads=4, patch_size=16,
                  text_dim=32, n_queries=16, n_decoder_layers=2, n_heads=4,
                  input_resolution=32)
    rng = np.random.RandomState(0)
    b, H, n_max, n_cat = 4, 32, 3, 4
    batch_np = {
        "image": rng.randn(b, 3, H, H).astype(np.float32),
        "instance_masks": (rng.rand(b, n_max, H, H) > 0.7).astype(np.float32),
        "instance_valid": np.ones((b, n_max), bool),
        "semantic_mask": rng.randint(0, n_cat, (b, H, H)).astype(np.int32),
    }
    text = rng.randn(n_cat, 32).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)

    init_params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch_np["image"]))["params"]
    tx = make_optimizer(base_lr=1e-5, n_iters=100)

    def fresh_params():
        # device_put may alias buffers; the donated train step would
        # otherwise delete init_params under us
        return jax.tree_util.tree_map(jnp.array, init_params)

    mesh = create_mesh({"data": 2, "model": 4})
    with mesh:
        state_m = TrainState.create(shard_params(fresh_params(), mesh), tx)
        step_m = make_train_step(
            model, tx, replicate(jnp.asarray(text), mesh), n_categories=n_cat)
        batch_m = shard_batch(
            {k: jnp.asarray(v) for k, v in batch_np.items()}, mesh)
        losses_m = []
        for _ in range(2):
            state_m, metrics_m = step_m(state_m, batch_m)
            losses_m.append(float(metrics_m["loss"]))

    state_1 = TrainState.create(fresh_params(), tx)
    step_1 = make_train_step(model, tx, jnp.asarray(text), n_categories=n_cat)
    batch_1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    losses_1 = []
    for _ in range(2):
        state_1, metrics_1 = step_1(state_1, batch_1)
        losses_1.append(float(metrics_1["loss"]))

    np.testing.assert_allclose(losses_m, losses_1, rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(metrics_m["confusion"]), np.asarray(metrics_1["confusion"]))
    flat_m = jax.tree_util.tree_leaves(state_m.params)
    flat_1 = jax.tree_util.tree_leaves(state_1.params)
    assert len(flat_m) == len(flat_1)
    # Adam normalises near-zero gradients to +-1, so reduction-order noise
    # in eps-dominated entries moves params by O(lr) regardless of layout
    # correctness; a genuine sharding bug shows up as O(param)-scale error.
    for a, b_ in zip(flat_m, flat_1):
        a, b_ = np.asarray(a, np.float64), np.asarray(b_, np.float64)
        rel = np.abs(a - b_) / np.maximum(np.abs(b_), 1.0)
        assert rel.max() < 1e-4, rel.max()
