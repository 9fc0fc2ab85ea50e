"""Hungarian matcher vs scipy.optimize.linear_sum_assignment (the reference's
backend, criterion.py:145)."""
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import jax
import jax.numpy as jnp

from zutis_tpu.ops.hungarian import batched_hungarian, hungarian


@pytest.mark.parametrize("shape", [(10, 100), (1, 100), (5, 5), (3, 7)])
def test_matches_scipy_total_cost(shape):
    rng = np.random.RandomState(0)
    for trial in range(20):
        cost = rng.rand(*shape).astype(np.float32)
        rows, cols = linear_sum_assignment(cost)
        want = cost[rows, cols].sum()
        got_cols = np.asarray(hungarian(jnp.asarray(cost)))
        assert len(set(got_cols.tolist())) == shape[0], "columns must be distinct"
        got = cost[np.arange(shape[0]), got_cols].sum()
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ties_and_constant_rows():
    # constant (padded) rows must not change the optimum over real rows
    rng = np.random.RandomState(1)
    real = rng.rand(4, 20).astype(np.float32)
    padded = np.concatenate([real, np.zeros((6, 20), np.float32)], axis=0)
    got_cols = np.asarray(hungarian(jnp.asarray(padded)))[:4]
    rows, cols = linear_sum_assignment(real)
    want = real[rows, cols].sum()
    got = real[np.arange(4), got_cols].sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_batched_and_jitted():
    rng = np.random.RandomState(2)
    cost = rng.rand(3, 2, 6, 12).astype(np.float32)
    fn = jax.jit(batched_hungarian)
    got = np.asarray(fn(jnp.asarray(cost)))
    assert got.shape == (3, 2, 6)
    for i in range(3):
        for j in range(2):
            rows, cols = linear_sum_assignment(cost[i, j])
            want = cost[i, j][rows, cols].sum()
            have = cost[i, j][np.arange(6), got[i, j]].sum()
            np.testing.assert_allclose(have, want, rtol=1e-5)


def test_nan_cost_terminates():
    """A NaN-poisoned cost matrix must return (garbage) instead of spinning
    the while_loop forever — NaN comparisons are all False, so without the
    explicit iteration bounds no column ever improves and no sink is found
    (the loss NaN guards downstream surface the divergence)."""
    import jax.numpy as jnp

    from zutis_tpu.ops.hungarian import batched_hungarian, hungarian

    cost = np.random.RandomState(0).rand(4, 6).astype(np.float32)
    cost[1, :] = np.nan
    out = np.asarray(hungarian(jnp.asarray(cost)))
    assert out.shape == (4,)

    cost_all = np.full((2, 3, 5), np.nan, np.float32)
    out = np.asarray(batched_hungarian(jnp.asarray(cost_all)))
    assert out.shape == (2, 3)
