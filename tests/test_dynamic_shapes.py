"""Dynamic (per-sample) geometry ops == their static counterparts."""
import numpy as np

import jax.numpy as jnp

from zutis_tpu.models.pos_embed import sine_pos_embed
from zutis_tpu.models.vit import interpolate_pos_embed
from zutis_tpu.ops import dynamic_shapes as D
from zutis_tpu.ops.resize import _resize_matrix, resize_2d


def test_dynamic_resize_matrix_matches_static():
    for in_native, out, mode in [(17, 40, "linear"), (24, 24, "cubic"),
                                 (31, 8, "linear"), (12, 50, "cubic")]:
        in_pad = 32 if in_native <= 32 else 64
        got = np.asarray(D.dynamic_resize_matrix(
            out, in_pad, jnp.asarray(in_native), mode))
        want = _resize_matrix(in_native, out, mode)
        np.testing.assert_allclose(got[:, :in_native], want, atol=1e-5)
        assert np.abs(got[:, in_native:]).max() == 0.0


def test_batched_resize_native_matches_per_image():
    rng = np.random.RandomState(0)
    hp, wp, H, W = 20, 24, 37, 51
    sizes = [(20, 24), (13, 17), (7, 24)]
    x = rng.randn(len(sizes), 3, hp, wp).astype(np.float32)
    native = jnp.asarray(sizes, jnp.int32)
    got = np.asarray(D.batched_resize_native(
        jnp.asarray(x), native, (H, W), "linear"))
    for i, (h, w) in enumerate(sizes):
        want = np.asarray(resize_2d(
            jnp.asarray(x[i:i + 1, :, :h, :w]), (H, W), "linear"))
        np.testing.assert_allclose(got[i:i + 1], want, atol=1e-5)


def test_replicate_edges():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 5, 6, 3).astype(np.float32)
    native = jnp.asarray([[3, 4], [5, 6]], jnp.int32)
    out = np.asarray(D.replicate_edges(jnp.asarray(x), native))
    np.testing.assert_array_equal(out[1], x[1])  # full native: unchanged
    np.testing.assert_array_equal(out[0, :3, :4], x[0, :3, :4])
    np.testing.assert_array_equal(out[0, 3, :4], x[0, 2, :4])  # row clamp
    np.testing.assert_array_equal(out[0, :3, 5], x[0, :3, 3])  # col clamp
    np.testing.assert_array_equal(out[0, 4, 5], x[0, 2, 3])  # corner


def test_sine_pos_embed_dynamic_matches_static():
    hp, wp, npf = 9, 11, 32
    sizes = [(9, 11), (5, 7)]
    got = np.asarray(D.sine_pos_embed_dynamic(
        hp, wp, npf, jnp.asarray(sizes, jnp.int32)))
    for i, (h, w) in enumerate(sizes):
        want = sine_pos_embed(h, w, npf)  # [2npf, h, w]
        got_i = got[i].reshape(hp, wp, 2 * npf)[:h, :w].transpose(2, 0, 1)
        np.testing.assert_allclose(got_i, want, atol=1e-5)


def test_interpolate_pos_embed_batched_matches_static():
    rng = np.random.RandomState(2)
    g, d = 14, 16
    pe = jnp.asarray(rng.randn(g * g + 1, d).astype(np.float32))
    hp, wp = 12, 13
    sizes = [(12, 13), (6, 9)]
    got = np.asarray(D.interpolate_pos_embed_batched(
        pe, jnp.asarray(sizes, jnp.int32), (hp, wp)))
    for i, (h, w) in enumerate(sizes):
        want = np.asarray(interpolate_pos_embed(pe, (h, w)))  # [1+h*w, d]
        np.testing.assert_allclose(got[i, 0], want[0], atol=1e-5)
        got_patch = got[i, 1:].reshape(hp, wp, d)[:h, :w]
        np.testing.assert_allclose(
            got_patch, want[1:].reshape(h, w, d), atol=1e-4)


def test_token_valid_mask():
    m = np.asarray(D.token_valid_mask(
        jnp.asarray([[2, 3], [4, 4]], jnp.int32), 4, 4))
    assert m[0].reshape(4, 4)[:2, :3].all() and m[0].sum() == 6
    assert m[1].all()
