"""Pallas flash-attention kernel vs plain-XLA attention (interpret mode on
the CPU test platform; the same kernel compiles on TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zutis_tpu.ops.attention import dot_product_attention
from zutis_tpu.ops.flash_attention import flash_attention


def _rand(rng, *shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32))


@pytest.mark.parametrize("b,h,sq,sk,d", [
    (2, 4, 577, 577, 64),   # encoder self-attention shape class (384px ViT)
    (1, 8, 100, 2304, 64),  # decoder cross-attention (100 queries x 48x48)
    (2, 2, 100, 100, 32),   # decoder self-attention
    (1, 1, 130, 260, 64),   # non-128-multiples exercise q and k padding
])
def test_matches_xla(b, h, sq, sk, d):
    rng = np.random.RandomState(0)
    q, k, v = (_rand(rng, b, h, s, d) for s in (sq, sk, sk))
    got = flash_attention(q, k, v)
    want = dot_product_attention(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_kv_mask_matches_xla():
    rng = np.random.RandomState(1)
    b, h, sq, sk, d = 3, 2, 64, 200, 32
    q, k, v = (_rand(rng, b, h, s, d) for s in (sq, sk, sk))
    mask = jnp.asarray((rng.rand(b, sk) > 0.3).astype(np.int32))
    got = flash_attention(q, k, v, kv_mask=mask)
    want = dot_product_attention(q, k, v, kv_mask=mask, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_padded_keys_ignored():
    """Result must equal attention over only the first sk keys even when the
    kernel pads sk to a 128 multiple internally."""
    rng = np.random.RandomState(2)
    b, h, sq, d = 1, 2, 32, 32
    q = _rand(rng, b, h, sq, d)
    k_small, v_small = _rand(rng, b, h, 150, d), _rand(rng, b, h, 150, d)
    got = flash_attention(q, k_small, v_small)
    want = dot_product_attention(q, k_small, v_small, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_xla():
    """custom_vjp backward (XLA recompute) == autodiff through the xla impl."""
    rng = np.random.RandomState(3)
    b, h, sq, sk, d = 2, 2, 72, 140, 32
    q, k, v = (_rand(rng, b, h, s, d) for s in (sq, sk, sk))

    def loss(fn):
        return lambda q, k, v: jnp.sum(jnp.sin(fn(q, k, v)))

    g_flash = jax.grad(loss(lambda q, k, v: flash_attention(q, k, v)),
                       argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss(lambda q, k, v: dot_product_attention(
        q, k, v, impl="xla")), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_auto_impl_resolves_to_xla_off_tpu(monkeypatch):
    """On the CPU test platform "auto" must use the xla path (and the
    ZUTIS_TPU_ATTN=pallas opt-in must not break it off-TPU)."""
    rng = np.random.RandomState(4)
    q, k, v = (_rand(rng, 1, 2, 16, 16) for _ in range(3))
    monkeypatch.setenv("ZUTIS_TPU_ATTN", "pallas")
    out = dot_product_attention(q, k, v, impl="auto")
    want = dot_product_attention(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)
