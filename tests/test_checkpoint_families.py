"""Checkpoint export/restore for every encoder family.

The reference-layout .pt export only exists for the ViT encoder (the
reference loads RN/DINO weights from their own upstream checkpoints,
/root/reference/networks/zutis.py:51-57) — RN/DINO Trainer checkpoints must
still round-trip (models/weights.py raw-tree export + core/checkpoint
load_params_any)."""
import numpy as np

import jax
import jax.numpy as jnp

from zutis_tpu.models.zutis import ZUTIS


def _roundtrip(model, tmp_path, x):
    from zutis_tpu.core.checkpoint import load_params_any
    from zutis_tpu.models.weights import export_zutis

    params = model.init(jax.random.PRNGKey(0), x)["params"]
    sd = export_zutis(jax.device_get(params))
    p = str(tmp_path / "ckpt.npz")
    np.savez(p, **sd)
    restored = load_params_any(p)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(restored)}
    assert len(flat_a) == len(flat_b)
    for k, v in flat_a:
        key = jax.tree_util.keystr(k)
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flat_b[key]), err_msg=key)
    # the restored tree must drive the same forward
    out_a = model.apply({"params": params}, x, inference=True)
    out_b = model.apply({"params": restored}, x, inference=True)
    np.testing.assert_array_equal(np.asarray(out_a["mask_proposals"]),
                                  np.asarray(out_b["mask_proposals"]))


def test_rn_checkpoint_roundtrip(tmp_path):
    model = ZUTIS(width=64, encoder_family="rn", rn_layers=(1, 1, 1, 1),
                  rn_width=2, text_dim=16, n_queries=4, n_decoder_layers=1,
                  n_heads=2, input_resolution=32, upsample_tokens=False)
    _roundtrip(model, tmp_path, jnp.zeros((1, 3, 32, 32)))


def test_dino_checkpoint_roundtrip(tmp_path):
    # DINO family requires width == text_dim (vision_to_text_ffn bridge)
    model = ZUTIS(width=16, encoder_family="dino", encoder_layers=1,
                  encoder_heads=2, patch_size=16, text_dim=16, n_queries=4,
                  n_decoder_layers=1, n_heads=2, input_resolution=32)
    _roundtrip(model, tmp_path, jnp.zeros((1, 3, 32, 32)))


def test_dilated_arch_name_normalisation():
    """'dilatedRN50' must resolve text specs and checkpoint paths through
    the base arch (the prefix only disables the visual token upsample)."""
    from zutis_tpu.models.factory import (
        build_text_encoder, clip_checkpoint_path,
    )

    enc = build_text_encoder("dilatedRN50")
    enc_base = build_text_encoder("RN50")
    assert (enc.width, enc.layers, enc.heads, enc.embed_dim) == \
        (enc_base.width, enc_base.layers, enc_base.heads, enc_base.embed_dim)
    assert clip_checkpoint_path("dilatedRN50", "/a") == \
        clip_checkpoint_path("RN50", "/a")
