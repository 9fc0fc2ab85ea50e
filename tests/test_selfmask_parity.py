"""SelfMask numeric parity vs a torch oracle mirroring the reference
(networks/selfmask/selfmask.py) — closes the round-1 gap where SelfMask was
shape-tested only. The oracle's state dict uses the released checkpoint's
exact key layout, so this also validates `convert_selfmask_checkpoint`."""
import numpy as np
import torch

import jax.numpy as jnp

from zutis_tpu.models.selfmask import (
    SelfMask,
    convert_selfmask_checkpoint,
    pad_to_patch_multiple,
)

from torch_oracle import TorchSelfMask


def _build(seed=0):
    torch.manual_seed(seed)
    oracle = TorchSelfMask(dim=32, heads=2, depth=2, patch=8, grid=4,
                           n_queries=5, dec_layers=2)
    oracle.eval()
    params = convert_selfmask_checkpoint(oracle.state_dict())
    model = SelfMask(n_queries=5, patch_size=8, n_decoder_layers=2,
                     embed_dim=32, heads=2, base_grid=4, depth=2)
    return oracle, model, params


def test_selfmask_forward_matches_torch():
    oracle, model, params = _build()
    x = np.random.RandomState(0).randn(2, 3, 32, 40).astype(np.float32)
    with torch.no_grad():
        want_mask, want_obj = oracle(torch.from_numpy(x))
    out = model.apply({"params": params}, jnp.asarray(x))
    # sigmoid saturation regions accumulate fp reassociation noise
    np.testing.assert_allclose(np.asarray(out["mask_pred"]),
                               want_mask.numpy(), rtol=2e-3, atol=7e-4)
    np.testing.assert_allclose(np.asarray(out["objectness"]),
                               want_obj.numpy(), rtol=2e-3, atol=2e-4)


def test_selfmask_best_mask_matches_torch_pipeline():
    """Full inference path: pad to patch multiple, x4 upsample, crop,
    argmax objectness, threshold (reference selfmask.py:204-224)."""
    oracle, model, params = _build(seed=1)
    H, W = 29, 35  # NOT patch multiples: exercises the pad/crop path
    x = np.random.RandomState(1).randn(1, 3, H, W).astype(np.float32)
    xp = pad_to_patch_multiple(x, 8)
    with torch.no_grad():
        mask, obj = oracle(torch.from_numpy(xp))
        up = torch.nn.functional.interpolate(
            mask, scale_factor=4, mode="bilinear", align_corners=False)
        up = up[..., :H, :W]
        best = int(torch.argmax(obj[0]))
        want_prob = up[0, best].numpy()
        want = (want_prob > 0.5).astype(np.uint8)
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(xp), method=SelfMask.best_masks))
    got = got[0, :H, :W]
    # binary equality except where the probability sits on the 0.5 decision
    # boundary (untrained random weights put ~0.5% of pixels within fp noise
    # of the threshold; real checkpoints are saturated). The exclusion band
    # matches the forward test's tolerance (rtol 2e-3): a pixel whose
    # probability differs by fp noise up to that bound may legitimately
    # flip if it sits within the same distance of 0.5
    decided = np.abs(want_prob - 0.5) > 2e-3
    np.testing.assert_array_equal(got[decided], want[decided])
    assert decided.mean() > 0.98
