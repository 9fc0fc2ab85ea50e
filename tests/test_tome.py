"""ToMe token merging (ops/tome.py + models/vit.py opt-in path).

Pins the exactness invariants VERDICT r4 task 3 asked for:
  * ratio 0 is the byte-identical original program (no new params, same
    param tree — one checkpoint serves every tome_r);
  * merging exact-duplicate tokens is lossless (weighted average + log-size
    proportional attention reproduce dense attention analytically);
  * the composed position mapping reconstructs a valid dense stream;
  * gradients flow through the merged encoder (trainable).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zutis_tpu.models import ZUTIS
from zutis_tpu.ops.attention import dot_product_attention
from zutis_tpu.ops.tome import (
    merge_schedule,
    proportional_attn_bias,
    tome_merge,
)


def test_merge_schedule_static_arithmetic():
    # 577 tokens (CLS + 24x24), r=24, 12 layers: every layer can merge 24
    sched = merge_schedule(577, 24, 12)
    assert sched == [24] * 12
    assert 577 - sum(sched) == 289
    # tiny stream: r clamps to the shrinking A/B split and never eats CLS
    sched = merge_schedule(5, 3, 4)
    s = 5
    for r in sched:
        sa, sb = (s + 1) // 2, s // 2
        assert 0 <= r <= min(sa - 1, sb)
        s -= r
    assert s >= 1  # CLS survives


def test_duplicate_tokens_merge_losslessly():
    rng = np.random.RandomState(0)
    s, d = 9, 16
    x = rng.randn(1, s, d).astype(np.float32)
    # a-tokens 2 and 4 duplicate their b-neighbours 1 and 3
    x[:, 2] = x[:, 1]
    x[:, 4] = x[:, 3]
    xj = jnp.asarray(x)
    size = jnp.ones((1, s), jnp.float32)
    x_new, size_new, mapping = tome_merge(xj, xj, size, r=2)
    assert x_new.shape == (1, s - 2, d)
    # sizes conserve token count
    assert float(jnp.sum(size_new)) == pytest.approx(s)
    # gathering the merged stream back must reproduce x exactly: the merged
    # tokens were exact duplicates, so their weighted average is themselves
    dense = np.asarray(jnp.take_along_axis(x_new, mapping[..., None], axis=1))
    np.testing.assert_array_equal(dense, x)
    # the two merged slots have size 2
    assert sorted(np.asarray(size_new)[0].tolist()) == [1] * 5 + [2, 2]


def test_proportional_attention_equals_dense_on_duplicates():
    """softmax over keys where key j appears n times with one value ==
    softmax over the deduplicated keys with +log(n) bias — the analytic
    identity behind ToMe's proportional attention."""
    rng = np.random.RandomState(1)
    b, h, sq, hd = 2, 2, 3, 8
    q = jnp.asarray(rng.randn(b, h, sq, hd).astype(np.float32))
    uniq = rng.randn(b, h, 4, hd).astype(np.float32)
    vals = rng.randn(b, h, 4, hd).astype(np.float32)
    # duplicated set: key 0 x3, key 1 x1, key 2 x2, key 3 x1
    reps = [3, 1, 2, 1]
    k_full = jnp.asarray(np.repeat(uniq, reps, axis=2))
    v_full = jnp.asarray(np.repeat(vals, reps, axis=2))
    dense = dot_product_attention(q, k_full, v_full)

    size = jnp.broadcast_to(
        jnp.asarray(reps, jnp.float32)[None], (b, 4)).astype(jnp.float32)
    bias = proportional_attn_bias(size)
    merged = dot_product_attention(
        q, jnp.asarray(uniq), jnp.asarray(vals), bias=bias)
    np.testing.assert_allclose(
        np.asarray(merged), np.asarray(dense), rtol=2e-5, atol=2e-6)


def test_mapping_is_valid_assignment():
    rng = np.random.RandomState(2)
    s, r = 33, 7
    x = jnp.asarray(rng.randn(2, s, 8).astype(np.float32))
    m = jnp.asarray(rng.randn(2, s, 8).astype(np.float32))
    x_new, size_new, mapping = tome_merge(
        x, m, jnp.ones((2, s), jnp.float32), r=r)
    mp = np.asarray(mapping)
    assert mp.min() >= 0 and mp.max() < s - r
    # every new slot is someone's assignment (no orphan tokens)
    for bi in range(2):
        assert len(np.unique(mp[bi])) == s - r
    # CLS (old position 0) still resolves to a slot of size >= 1 that, by
    # construction, no merge targeted: its size must be exactly 1
    sizes = np.asarray(size_new)
    assert sizes[0, mp[0, 0]] == 1.0 and sizes[1, mp[1, 0]] == 1.0
    assert np.sum(sizes[0]) == pytest.approx(s)


def _tiny(tome_r=0):
    return ZUTIS(width=64, encoder_layers=3, encoder_heads=4, patch_size=16,
                 text_dim=32, n_queries=8, n_decoder_layers=2, n_heads=4,
                 input_resolution=32, tome_r=tome_r)


def test_tome_zero_is_same_program_and_params():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 3, 64, 64).astype(np.float32))
    base, tome = _tiny(0), _tiny(6)
    p_base = base.init(jax.random.PRNGKey(0), x)["params"]
    p_tome = tome.init(jax.random.PRNGKey(0), x)["params"]
    # ToMe adds NO parameters: one checkpoint serves every merge ratio
    assert jax.tree_util.tree_structure(p_base) == \
        jax.tree_util.tree_structure(p_tome)
    for a, b in zip(jax.tree_util.tree_leaves(p_base),
                    jax.tree_util.tree_leaves(p_tome)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out0 = base.apply({"params": p_base}, x)
    out_r0 = ZUTIS(width=64, encoder_layers=3, encoder_heads=4, patch_size=16,
                   text_dim=32, n_queries=8, n_decoder_layers=2, n_heads=4,
                   input_resolution=32, tome_r=0).apply({"params": p_base}, x)
    np.testing.assert_array_equal(np.asarray(out0["patch_tokens"]),
                                  np.asarray(out_r0["patch_tokens"]))


def test_tome_forward_shapes_and_sanity():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 3, 64, 64).astype(np.float32))
    base, tome = _tiny(0), _tiny(4)  # 17 tokens: 4x4 grid + CLS
    params = base.init(jax.random.PRNGKey(0), x)["params"]
    out_b = base.apply({"params": params}, x)
    out_t = tome.apply({"params": params}, x)
    for k in ("mask_proposals", "patch_tokens"):
        assert out_t[k].shape == out_b[k].shape, k
        assert np.isfinite(np.asarray(out_t[k])).all(), k
    # merged output stays in the ballpark of the dense one (merging a tiny
    # random model is lossy but bounded: unit-norm text tokens)
    n = np.linalg.norm(np.asarray(out_t["patch_tokens"]), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-3)


def test_tome_gradients_flow():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    tome = _tiny(4)
    params = tome.init(jax.random.PRNGKey(0), x)["params"]

    def loss_fn(p):
        out = tome.apply({"params": p}, x)
        return jnp.sum(out["mask_proposals"]) + jnp.sum(out["patch_tokens"])

    grads = jax.grad(loss_fn)(params)
    g_conv = np.asarray(grads["encoder"]["conv1"]["kernel"])
    g_attn = np.asarray(
        grads["encoder"]["resblocks_0"]["attn"]["k_proj"]["kernel"])
    assert np.isfinite(g_conv).all() and np.abs(g_conv).max() > 0
    assert np.isfinite(g_attn).all() and np.abs(g_attn).max() > 0


def test_forward_padded_tome_full_bucket_matches_dense():
    """A sample that fills its bucket runs the padded ToMe program with
    every token size-1 valid — the padding-aware scoring is inert and the
    result must match the dense ToMe path (up to the padded program's
    usual fp reassociation)."""
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 3, 64, 64).astype(np.float32))
    tome = _tiny(3)
    params = _tiny(0).init(jax.random.PRNGKey(0), x)["params"]
    grid = jnp.full((2, 2), 4, jnp.int32)  # native == bucket (4x4 tokens)
    out_p = tome.apply({"params": params}, x, grid,
                       method=ZUTIS.forward_padded)
    out_d = tome.apply({"params": params}, x, inference=True)
    np.testing.assert_allclose(
        np.asarray(out_p["mask_proposals"][:, -1]),
        np.asarray(out_d["mask_proposals"][:, -1]), atol=2e-4)


def test_forward_padded_tome_padding_invariance():
    """Valid outputs must be IDENTICAL regardless of padding pixel content:
    padding tokens merge with zero weight, their merge targets are
    constant-scored (not similarity-scored), and every attention masks
    size-0 keys — so garbage cannot leak into the valid window."""
    rng = np.random.RandomState(7)
    native = rng.randn(1, 3, 32, 48).astype(np.float32)  # 2x3 token grid
    bucket = (64, 64)
    tome = _tiny(3)
    params = _tiny(0).init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32)))["params"]
    grid = jnp.asarray([[2, 3]], jnp.int32)

    outs = []
    for fill in (0.0, 123.456):
        padded = np.full((1, 3, *bucket), fill, np.float32)
        padded[:, :, :32, :48] = native
        out = tome.apply({"params": params}, jnp.asarray(padded), grid,
                         method=ZUTIS.forward_padded)
        h, w = np.asarray(out["native_grid"][0])  # post-upsample window
        outs.append(np.asarray(out["mask_proposals"])[0, -1, :, :h, :w])
    np.testing.assert_array_equal(outs[0], outs[1])
