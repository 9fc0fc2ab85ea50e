"""Numerical parity of zutis_tpu models vs torch oracles on random weights."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from zutis_tpu.models.decoder import QueryDecoder
from zutis_tpu.models.pos_embed import sine_pos_embed
from zutis_tpu.models.vit import CLIPViT
from zutis_tpu.models import weights as W

from torch_oracle import (
    TorchCLIPViT, TorchQueryDecoder, torch_sine_pos_embed,
)

TOL = dict(rtol=2e-4, atol=2e-5)


def test_sine_pos_embed_matches_reference():
    for h, w, npf in [(7, 9, 64), (24, 24, 384)]:
        want = torch_sine_pos_embed(h, w, npf).numpy()[0]
        got = sine_pos_embed(h, w, npf)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("hw", [(224, 224), (192, 256)])
def test_clip_vit_matches_torch(hw):
    torch.manual_seed(0)
    oracle = TorchCLIPViT(width=64, layers=2, heads=4, patch=16, out_dim=32)
    oracle.eval()

    sd = {f"visual.{k}": v for k, v in oracle.state_dict().items()}
    # oracle names resblocks directly; reference nests under transformer.
    sd = {k.replace("visual.resblocks", "visual.transformer.resblocks"): v
          for k, v in sd.items()}
    params = W.convert_clip_visual(sd)

    model = CLIPViT(width=64, layers=2, heads=4, patch_size=16, output_dim=32)
    x = np.random.RandomState(0).randn(2, 3, *hw).astype(np.float32)

    with torch.no_grad():
        want, h, w = oracle(torch.from_numpy(x))
    got, gh, gw = model.apply({"params": params}, jnp.asarray(x))
    assert (gh, gw) == (h, w)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), **TOL)


def test_query_decoder_matches_torch():
    torch.manual_seed(1)
    d, heads, L, Q, S, B = 64, 4, 3, 10, 36, 2
    oracle = TorchQueryDecoder(d, heads, L, ff=128)
    oracle.eval()

    sd = {}
    for k, v in oracle.state_dict().items():
        sd["decoder." + k] = v
    params = W.convert_zutis({
        **sd,
        # minimal fillers so convert_zutis finds all sections
        **{f"ffn{i}.layers.{j}.{p}": torch.zeros(2, 2) if p == "weight"
           else torch.zeros(2)
           for i in (1, 2) for j in range(3) for p in ("weight", "bias")},
        "query_embed": torch.zeros(Q, d),
        "encoder.conv1.weight": torch.zeros(8, 3, 4, 4),
        "encoder.class_embedding": torch.zeros(8),
        "encoder.positional_embedding": torch.zeros(5, 8),
        "encoder.proj": torch.zeros(8, 4),
        "encoder.ln_pre.weight": torch.ones(8),
        "encoder.ln_pre.bias": torch.zeros(8),
        "encoder.ln_post.weight": torch.ones(8),
        "encoder.ln_post.bias": torch.zeros(8),
    })["decoder"]

    rng = np.random.RandomState(2)
    memory = rng.randn(B, S, d).astype(np.float32)
    pos = rng.randn(B, S, d).astype(np.float32)
    query_pos = rng.randn(B, Q, d).astype(np.float32)
    tgt = np.zeros((B, Q, d), np.float32)

    def t(x):  # batch-first -> seq-first
        return torch.from_numpy(x.transpose(1, 0, 2))

    with torch.no_grad():
        want = oracle(t(tgt), t(memory), t(pos), t(query_pos)).numpy()
    want = want.transpose(0, 2, 1, 3)  # [L, s, b, d] -> [L, b, q, d]

    model = QueryDecoder(d_model=d, heads=heads, num_layers=L,
                         dim_feedforward=128)
    got = model.apply({"params": params}, jnp.asarray(tgt), jnp.asarray(memory),
                      jnp.asarray(pos), jnp.asarray(query_pos))
    # post-LayerNorm outputs are O(1): absolute tolerance absorbs fp32
    # accumulation-order differences across 3 decoder layers
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=5e-4)


def test_encode_image_pooled_path():
    torch.manual_seed(3)
    oracle = TorchCLIPViT(width=64, layers=2, heads=4, patch=16, out_dim=32)
    oracle.eval()
    sd = {f"visual.{k}".replace("visual.resblocks",
                                "visual.transformer.resblocks"): v
          for k, v in oracle.state_dict().items()}
    params = W.convert_clip_visual(sd)
    model = CLIPViT(width=64, layers=2, heads=4, patch_size=16, output_dim=32)
    x = np.random.RandomState(4).randn(1, 3, 224, 224).astype(np.float32)

    # torch pooled: ln_post(CLS) @ proj computed through the oracle internals
    with torch.no_grad():
        xt = torch.from_numpy(x)
        feat = oracle.conv1(xt).flatten(2).permute(0, 2, 1)
        cls = oracle.class_embedding[None, None].expand(1, 1, -1)
        toks = torch.cat([cls, feat], 1) + oracle.interp_pos(
            oracle.positional_embedding, (14, 14))[None]
        toks = oracle.ln_pre(toks).permute(1, 0, 2)
        for blk in oracle.resblocks:
            toks = blk(toks)
        want = (oracle.ln_post(toks.permute(1, 0, 2)[:, 0]) @ oracle.proj).numpy()

    got = model.apply({"params": params}, jnp.asarray(x),
                      method=CLIPViT.encode_image)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)


def test_modified_resnet_matches_torch():
    """Dense feature path parity: stem + 4 anti-aliased bottleneck stages,
    frozen BN (reference clip_arch.py:156-264)."""
    from torch_oracle import TorchModifiedResNet
    from zutis_tpu.models.resnet import ModifiedResNet

    torch.manual_seed(5)
    oracle = TorchModifiedResNet(layers=(1, 2, 1, 1), width=8, output_dim=32,
                                 heads=4, input_resolution=64)
    # randomise BN stats so frozen-BN math is actually exercised
    for m in oracle.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    oracle.eval()
    params = W.convert_clip_rn_visual(oracle.state_dict_clip_layout())

    model = ModifiedResNet(layers=(1, 2, 1, 1), width=8, output_dim=32,
                           heads=4, input_resolution=64)
    x = np.random.RandomState(6).randn(2, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        want, h, w = oracle(torch.from_numpy(x))
    got, gh, gw = model.apply({"params": params}, jnp.asarray(x))
    assert (gh, gw) == (h, w) == (2, 3)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-3, atol=2e-4)


def test_attnpool_tokens_matches_torch():
    """AttentionPool2d-as-projection parity, incl. pos-emb interpolation to a
    non-native grid (reference clip_arch.py:60-126, zutis.py:309-316)."""
    from torch_oracle import TorchModifiedResNet
    from zutis_tpu.models.resnet import ModifiedResNet

    torch.manual_seed(7)
    oracle = TorchModifiedResNet(layers=(1, 1, 1, 1), width=8, output_dim=32,
                                 heads=4, input_resolution=64)
    oracle.eval()
    params = W.convert_clip_rn_visual(oracle.state_dict_clip_layout())
    model = ModifiedResNet(layers=(1, 1, 1, 1), width=8, output_dim=32,
                           heads=4, input_resolution=64)

    rng = np.random.RandomState(8)
    grid = rng.randn(2, 4, 6, 8 * 32).astype(np.float32)  # non-native 4x6
    with torch.no_grad():
        want = oracle.attnpool(
            torch.from_numpy(grid.transpose(0, 3, 1, 2)))  # [(1+hw), b, out]
        want = want[1:].permute(1, 0, 2).reshape(2, 4, 6, 32).numpy()
    got = model.apply({"params": params}, jnp.asarray(grid),
                      method=ModifiedResNet.attnpool_tokens)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)


def test_zutis_rn_forward_shapes():
    """RN-family ZUTIS builds and runs: x2 upsample for RN50, no upsample
    for dilatedRN50 (reference networks/zutis.py:488-497)."""
    from zutis_tpu.models.factory import normalize_clip_arch
    from zutis_tpu.models.zutis import ZUTIS

    for arch, expect_hw in [("RN50", 4), ("dilatedRN50", 2)]:
        base, upsample = normalize_clip_arch(arch)
        assert base == "RN50"
        # RN50 block structure shrunk for test speed (rn_width 8 -> width 256)
        model = ZUTIS(encoder_family="rn", rn_layers=(1, 1, 1, 1), rn_width=8,
                      width=256, text_dim=64, input_resolution=64,
                      n_queries=7, n_decoder_layers=2, n_heads=8,
                      upsample_tokens=upsample)
        x = jnp.asarray(np.random.RandomState(9).randn(1, 3, 64, 64),
                        jnp.float32)
        variables = model.init(jax.random.PRNGKey(1), x)
        out = model.apply(variables, x)
        hw = expect_hw
        assert out["mask_proposals"].shape == (1, 2, 7, hw, hw)
        assert out["patch_tokens"].shape == (1, hw, hw, 64)


def test_frozen_bn_stats_masked_from_optimizer():
    """running_mean/var receive no updates (incl. weight decay) while the
    affine scale/bias do (engine/optim.py:_zero_frozen_stats)."""
    import optax
    from zutis_tpu.engine.optim import make_optimizer

    params = {"encoder": {"bn1": {
        "scale": jnp.ones(3), "bias": jnp.zeros(3),
        "running_mean": jnp.full(3, 0.7), "running_var": jnp.full(3, 1.3),
    }}}
    opt = make_optimizer(base_lr=0.1, n_iters=10, weight_decay=0.5)
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    bn = new["encoder"]["bn1"]
    np.testing.assert_allclose(np.asarray(bn["running_mean"]), 0.7)
    np.testing.assert_allclose(np.asarray(bn["running_var"]), 1.3)
    assert float(jnp.abs(bn["scale"] - 1.0).sum()) > 0
    assert float(jnp.abs(bn["bias"]).sum()) > 0


def test_weight_export_roundtrip():
    model = CLIPViT(width=32, layers=1, heads=2, patch_size=16, output_dim=16)
    x = jnp.zeros((1, 3, 32, 32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    from zutis_tpu.models.zutis import ZUTIS
    z = ZUTIS(width=32, encoder_layers=1, encoder_heads=2, patch_size=16,
              text_dim=16, n_queries=5, n_decoder_layers=2, n_heads=2)
    zp = z.init(jax.random.PRNGKey(0), x)["params"]
    sd = W.export_zutis(zp)
    back = W.convert_zutis(sd)
    flat_a = jax.tree_util.tree_leaves(zp)
    flat_b = jax.tree_util.tree_leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_zutis_dino_encoder_family():
    """encoder_type="dino" arm: DINO DeiT encoder bridged into the text dim
    by vision_to_text_ffn before the upsample (reference
    networks/zutis.py:73-100,482-486); converter round-trips an official
    DINO-layout checkpoint."""
    from zutis_tpu.models.zutis import ZUTIS

    model = ZUTIS(encoder_family="dino", width=16, text_dim=16,
                  patch_size=16, input_resolution=32, dino_embed_dim=32,
                  dino_depth=1, dino_heads=2, n_queries=5,
                  n_decoder_layers=1, n_heads=2)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 3, 64, 64), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    # 64/16 = 4 grid, x2 upsample -> 8
    assert out["mask_proposals"].shape == (1, 1, 5, 8, 8)
    assert out["patch_tokens"].shape == (1, 8, 8, 16)

    # converter handles the official DINO key layout
    from torch_oracle import TorchDeiTBlock
    torch.manual_seed(2)
    blk = TorchDeiTBlock(32, 2)
    sd = {
        "patch_embed.proj.weight": torch.randn(32, 3, 16, 16),
        "patch_embed.proj.bias": torch.randn(32),
        "cls_token": torch.zeros(1, 1, 32),
        "pos_embed": torch.randn(1, 5, 32),
        "norm.weight": torch.ones(32), "norm.bias": torch.zeros(32),
        **{f"blocks.0.{k}": v for k, v in blk.state_dict().items()},
    }
    enc_params = W.convert_dino_encoder(sd)
    new_params = dict(params)
    new_params["encoder"] = jax.tree_util.tree_map(jnp.asarray, enc_params)
    out2 = model.apply({"params": new_params}, x)
    assert np.isfinite(np.asarray(out2["patch_tokens"])).all()


def test_torch_checkpoint_export_roundtrip(tmp_path):
    """save_torch_checkpoint -> torch.load -> convert_zutis reproduces the
    params exactly (the reference's trainer.py:302 load path accepts the
    file)."""
    from zutis_tpu.models.weights import save_torch_checkpoint
    from zutis_tpu.core.checkpoint import load_params_any
    from zutis_tpu.models.zutis import ZUTIS

    z = ZUTIS(width=32, encoder_layers=1, encoder_heads=2, patch_size=16,
              text_dim=16, n_queries=5, n_decoder_layers=2, n_heads=2)
    zp = z.init(jax.random.PRNGKey(3), jnp.zeros((1, 3, 32, 32)))["params"]
    fp = str(tmp_path / "model.pt")
    save_torch_checkpoint(zp, fp)
    back = load_params_any(fp)
    leaves_a = jax.tree_util.tree_leaves(zp)
    leaves_b = jax.tree_util.tree_leaves(back)
    # a truncated/partial restored tree must fail, not pass vacuously
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
