"""Sequence-parallel attention (ring + Ulysses) == dense single-device
attention, on the 8-device CPU mesh (SURVEY.md sections 2.4/5 long-context
rows)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from zutis_tpu.ops.attention import dot_product_attention
from zutis_tpu.parallel.sp import make_ring_attention, make_ulysses_attention


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8]).reshape(8)
    return Mesh(devs, ("model",))


def _qkv(b=2, h=8, s=64, d=16, seed=0):
    rng = np.random.RandomState(seed)
    return tuple(
        jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
        for _ in range(3)
    )


def test_ring_attention_matches_dense(mesh):
    q, k, v = _qkv()
    want = dot_product_attention(q, k, v, impl="xla")
    got = make_ring_attention(mesh, "model")(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ulysses_attention_matches_dense(mesh):
    q, k, v = _qkv(seed=1)
    want = dot_product_attention(q, k, v, impl="xla")
    got = make_ulysses_attention(mesh, "model")(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_attention_long_sequence(mesh):
    # a shape class like high-res dense inference (4k tokens across 8 chips)
    q, k, v = _qkv(b=1, h=4, s=512, d=32, seed=2)
    want = dot_product_attention(q, k, v, impl="xla")
    got = make_ring_attention(mesh, "model")(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
