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


def test_bf16_softmax_inf_bias_masks_exactly():
    """The bf16 max-free softmax must give EXACTLY zero weight to keys
    masked with a -inf additive bias — including when every legitimate
    logit in the row is saturated very negative (a two-sided clip would
    collapse both onto the same value and leak weight to masked keys)."""
    import numpy as np

    from zutis_tpu.ops.attention import _softmax_weights

    b, h, sq, sk = 1, 1, 2, 6
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(b, h, sq, sk).astype(np.float32))
    # row 1: legitimate logits pushed below the OLD two-sided clip (-80)
    # but above exp()'s f32 underflow (~-87.3): the old clip collapsed
    # these onto the same -80 as the masked keys -> uniform leak over all
    # six keys; the one-sided clamp must keep them distinguishable
    logits = logits.at[0, 0, 1].set(-85.0 + 0.1 * logits[0, 0, 1])
    bias = np.zeros((b, h, sq, sk), np.float32)
    bias[..., 3:] = -np.inf  # mask the last three keys in every row
    w = _softmax_weights(
        logits, scale=1.0, bias=jnp.asarray(bias), kv_mask=None,
        compute_dtype=jnp.bfloat16,
    )
    w = np.asarray(w)
    assert (w[..., 3:] == 0).all(), "masked keys received nonzero weight"
    np.testing.assert_allclose(w[..., :3].sum(-1), 1.0, rtol=1e-5)
    # the saturated row still distributes weight over UNMASKED keys only
    assert (w[0, 0, 1, :3] > 0).all()


def test_bf16_softmax_matches_f32_with_bias():
    """bf16 fast path == f32 reference softmax for finite + -inf biases."""
    import numpy as np

    from zutis_tpu.ops.attention import _softmax_weights

    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(2, 2, 4, 8).astype(np.float32) * 5)
    bias = rng.randn(2, 2, 4, 8).astype(np.float32)
    bias[..., -2:] = -np.inf
    w_fast = np.asarray(_softmax_weights(
        logits, 0.5, jnp.asarray(bias), None, jnp.bfloat16))
    w_ref = np.asarray(_softmax_weights(
        logits, 0.5, jnp.asarray(bias), None, jnp.float32))
    np.testing.assert_allclose(w_fast, w_ref, atol=1e-6)
