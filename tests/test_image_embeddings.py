"""CLIP image preprocessing + bank extraction (retrieval/image_embeddings.py;
reference utils/extract_image_embeddings.py:21-115)."""
import pickle

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from zutis_tpu.models.vit import CLIPViT
from zutis_tpu.retrieval.image_embeddings import (
    clip_preprocess,
    extract_image_embeddings,
)

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def test_clip_preprocess_matches_pil_oracle():
    """Shorter-side bicubic resize + center crop + CLIP normalisation — the
    pipeline clip.load builds (torchvision Resize/CenterCrop/Normalize,
    which operate through these exact PIL calls on PIL inputs)."""
    rng = np.random.RandomState(0)
    pil = Image.fromarray(rng.randint(0, 255, (50, 75, 3), np.uint8))
    R = 32
    got = clip_preprocess(pil, R)
    assert got.shape == (3, R, R) and got.dtype == np.float32

    # independent PIL construction: scale shorter side to R, center crop
    w, h = pil.size
    scale = R / min(w, h)
    ref = pil.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
    w2, h2 = ref.size
    left, top = (w2 - R) // 2, (h2 - R) // 2
    ref = ref.crop((left, top, left + R, top + R))
    want = (np.asarray(ref, np.float32) / 255.0 - np.asarray(CLIP_MEAN)) \
        / np.asarray(CLIP_STD)
    np.testing.assert_allclose(got, want.transpose(2, 0, 1), atol=1e-6)


def test_extract_image_embeddings_bank(tmp_path):
    """Bank extraction: unit-norm embeddings keyed by path, pickled in the
    reference format, tail batch padded not duplicated."""
    rng = np.random.RandomState(1)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"im{i}.png")
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(p)
        paths.append(p)

    enc = CLIPViT(width=32, layers=1, heads=2, patch_size=16, output_dim=16,
                  input_resolution=32)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))[
        "params"]
    fp = str(tmp_path / "bank.pkl")
    bank = extract_image_embeddings(paths, enc, params, resolution=32,
                                    batch_size=2, fp=fp)
    assert sorted(bank) == sorted(paths)
    for e in bank.values():
        assert e.shape == (16,)
        np.testing.assert_allclose(np.linalg.norm(e), 1.0, rtol=1e-5)
    with open(fp, "rb") as f:
        loaded = pickle.load(f)
    np.testing.assert_array_equal(loaded[paths[0]], bank[paths[0]])
