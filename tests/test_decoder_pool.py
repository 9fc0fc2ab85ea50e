"""Decoder-memory pooling (models/zutis.py `decoder_pool` opt-in lever).

Pins the lever's invariants, mirroring tests/test_tome.py's contract for
ToMe (the other measured throughput lever):
  * pool=1 is the byte-identical original program, no new params — one
    checkpoint serves every pool factor;
  * pooling is analytically exact when each p x p cell holds identical
    tokens: n identical keys sharing one value attract exactly the softmax
    mass of their pooled key (uniform cell sizes cancel in the softmax, so
    no proportional-attention bias is needed);
  * mask proposals keep the DENSE grid resolution — only cross-attention
    reads the pooled memory (reference networks/zutis.py:510-526 keeps the
    proposal einsum on the full x2-upsampled memory);
  * gradients flow; composes with tome_r;
  * the padded batched-eval path pools with validity weights plus a
    +log(valid-count) attention bias: a full bucket reproduces the dense
    pooled program, and partial boundary cells match masked dense
    attention analytically.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zutis_tpu.models import ZUTIS
from zutis_tpu.models.decoder import QueryDecoder


def _tiny(decoder_pool=1, tome_r=0):
    return ZUTIS(width=64, encoder_layers=3, encoder_heads=4, patch_size=16,
                 text_dim=32, n_queries=8, n_decoder_layers=2, n_heads=4,
                 input_resolution=32, decoder_pool=decoder_pool,
                 tome_r=tome_r)


def test_pool_one_is_same_program_and_params():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, 64, 64).astype(np.float32))
    base, pooled = _tiny(1), _tiny(2)
    p_base = base.init(jax.random.PRNGKey(0), x)["params"]
    p_pool = pooled.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(p_base) == \
        jax.tree_util.tree_structure(p_pool)
    for a, b in zip(jax.tree_util.tree_leaves(p_base),
                    jax.tree_util.tree_leaves(p_pool)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out0 = base.apply({"params": p_base}, x)
    out1 = _tiny(1).apply({"params": p_base}, x)
    np.testing.assert_array_equal(np.asarray(out0["mask_proposals"]),
                                  np.asarray(out1["mask_proposals"]))


def test_pooled_attention_exact_on_cellwise_constant_memory():
    """QueryDecoder over a dense memory whose p x p cells are constant ==
    the same decoder over the pooled memory (softmax-mass identity with
    uniform cell sizes; values identical)."""
    rng = np.random.RandomState(1)
    b, hs, ws, p, d = 2, 4, 6, 2, 32
    small = rng.randn(b, hs // p, ws // p, d).astype(np.float32)
    pos_small = rng.randn(1, hs // p, ws // p, d).astype(np.float32)

    def rep(t):
        return np.repeat(np.repeat(t, p, axis=1), p, axis=2)

    mem_dense = jnp.asarray(rep(small).reshape(b, hs * ws, d))
    pos_dense = jnp.asarray(
        np.broadcast_to(rep(pos_small), (b, hs, ws, d)).reshape(b, -1, d))
    mem_small = jnp.asarray(small.reshape(b, -1, d))
    pos_small_j = jnp.asarray(
        np.broadcast_to(pos_small, (b, hs // p, ws // p, d)).reshape(b, -1, d))

    dec = QueryDecoder(d_model=d, heads=4, num_layers=2)
    tgt = jnp.zeros((b, 5, d))
    qp = jnp.asarray(rng.randn(b, 5, d).astype(np.float32))
    params = dec.init(jax.random.PRNGKey(0), tgt, mem_dense)["params"]
    out_dense = dec.apply({"params": params}, tgt, mem_dense,
                          pos=pos_dense, query_pos=qp)
    out_pooled = dec.apply({"params": params}, tgt, mem_small,
                           pos=pos_small_j, query_pos=qp)
    np.testing.assert_allclose(np.asarray(out_pooled), np.asarray(out_dense),
                               rtol=2e-5, atol=2e-5)


def test_pooled_forward_keeps_dense_proposals():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 3, 64, 64).astype(np.float32))
    base, pooled = _tiny(1), _tiny(2)
    params = base.init(jax.random.PRNGKey(0), x)["params"]
    out_b = base.apply({"params": params}, x)
    out_p = pooled.apply({"params": params}, x)
    for k in ("mask_proposals", "patch_tokens"):
        assert out_p[k].shape == out_b[k].shape, k
        assert np.isfinite(np.asarray(out_p[k])).all(), k
    # the dense text-space map never touches the decoder: bit-equal
    np.testing.assert_array_equal(np.asarray(out_p["patch_tokens"]),
                                  np.asarray(out_b["patch_tokens"]))


def test_pool_composes_with_tome():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    both = _tiny(decoder_pool=2, tome_r=4)
    params = _tiny().init(jax.random.PRNGKey(0), x)["params"]
    out = both.apply({"params": params}, x)
    assert out["mask_proposals"].shape[-2:] == (8, 8)
    assert np.isfinite(np.asarray(out["mask_proposals"])).all()


def test_pool_gradients_flow():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    pooled = _tiny(2)
    params = pooled.init(jax.random.PRNGKey(0), x)["params"]

    def loss_fn(p):
        out = pooled.apply({"params": p}, x)
        return jnp.sum(out["mask_proposals"])

    grads = jax.grad(loss_fn)(params)
    g_kv = np.asarray(
        grads["decoder"]["layers_0"]["cross_attn"]["k_proj"]["kernel"])
    g_q = np.asarray(grads["query_embed"])
    assert np.isfinite(g_kv).all() and np.abs(g_kv).max() > 0
    assert np.isfinite(g_q).all() and np.abs(g_q).max() > 0


def test_pool_must_divide_grid():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    bad = _tiny(3)  # 8x8 post-upsample grid, 3 does not divide
    with pytest.raises(AssertionError, match="must divide"):
        bad.init(jax.random.PRNGKey(0), x)


def test_forward_padded_full_bucket_matches_dense_pool():
    """A sample that fills its bucket runs the padded pooled program with
    every cell fully valid — the +log(p^2) bias is uniform (softmax-
    invariant) and validity-weighted pooling reduces to plain pooling, so
    the result must match the dense pooled `__call__`."""
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 3, 64, 64).astype(np.float32))
    pooled = _tiny(2)
    params = _tiny().init(jax.random.PRNGKey(0), x)["params"]
    grid = jnp.full((2, 2), 4, jnp.int32)  # native == bucket (4x4 tokens)
    out_p = pooled.apply({"params": params}, x, grid,
                         method=ZUTIS.forward_padded)
    out_d = pooled.apply({"params": params}, x, inference=True)
    np.testing.assert_allclose(
        np.asarray(out_p["mask_proposals"][:, -1]),
        np.asarray(out_d["mask_proposals"][:, -1]), atol=2e-4)


def test_padded_pool_partial_cells_match_masked_dense():
    """Decoder-level analytic identity for PARTIAL cells: dense masked
    attention over cells holding c identical valid tokens == pooled
    attention with kv-mask (c>0) and +log(c) bias."""
    rng = np.random.RandomState(7)
    b, hs, ws, p, d = 2, 4, 4, 2, 32
    ncell = (hs // p) * (ws // p)
    small = rng.randn(b, ncell, d).astype(np.float32)
    pos_small = rng.randn(b, ncell, d).astype(np.float32)
    # per-cell valid counts in [0, p^2]; keep at least one non-empty cell
    counts = rng.randint(0, p * p + 1, (b, ncell))
    counts[:, 0] = np.maximum(counts[:, 0], 1)

    # dense memory: replicate each cell's token; validity marks the first
    # `count` copies of each cell valid
    mem_dense = np.zeros((b, hs * ws, d), np.float32)
    pos_dense = np.zeros((b, hs * ws, d), np.float32)
    valid = np.zeros((b, hs * ws), bool)
    cell_of = np.zeros((hs * ws,), np.int32)
    slot_of = np.zeros((hs * ws,), np.int32)
    for yy in range(hs):
        for xx in range(ws):
            i = yy * ws + xx
            cell_of[i] = (yy // p) * (ws // p) + (xx // p)
            slot_of[i] = (yy % p) * p + (xx % p)
    for bi in range(b):
        for i in range(hs * ws):
            c = cell_of[i]
            mem_dense[bi, i] = small[bi, c]
            pos_dense[bi, i] = pos_small[bi, c]
            valid[bi, i] = slot_of[i] < counts[bi, c]

    dec = QueryDecoder(d_model=d, heads=4, num_layers=2)
    tgt = jnp.zeros((b, 5, d))
    qp = jnp.asarray(rng.randn(b, 5, d).astype(np.float32))
    params = dec.init(jax.random.PRNGKey(0), tgt,
                      jnp.asarray(mem_dense))["params"]
    out_dense = dec.apply(
        {"params": params}, tgt, jnp.asarray(mem_dense),
        pos=jnp.asarray(pos_dense), query_pos=qp,
        memory_mask=jnp.asarray(valid))
    out_pooled = dec.apply(
        {"params": params}, tgt, jnp.asarray(small),
        pos=jnp.asarray(pos_small), query_pos=qp,
        memory_mask=jnp.asarray(counts > 0),
        memory_bias=jnp.asarray(
            np.log(np.maximum(counts, 1))[:, None, None, :]
            .astype(np.float32)))
    np.testing.assert_allclose(np.asarray(out_pooled), np.asarray(out_dense),
                               rtol=2e-5, atol=2e-5)
