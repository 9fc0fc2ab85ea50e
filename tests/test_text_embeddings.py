"""Text-embedding extraction semantics (retrieval/text_embeddings.py;
reference utils/extract_text_embeddings.py:98-141): per-template unit
normalisation, mean, re-normalisation, reference pickle format."""
import pickle

import numpy as np

import flax.linen as nn
import jax.numpy as jnp

from zutis_tpu.data.tokenizer import CLIPTokenizer
from zutis_tpu.retrieval.text_embeddings import (
    plain_category_embeddings,
    prompt_engineered_embeddings,
)


class StubTextEncoder(nn.Module):
    """Deterministic 'encoder': embeds token-id statistics so different
    prompts give different vectors without real weights."""

    dim: int = 8

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        t = tokens.astype(jnp.float32)
        feats = [t.sum(-1), (t ** 2).sum(-1) / 1e3, t.max(-1),
                 (t > 0).sum(-1).astype(jnp.float32)]
        base = jnp.stack(feats, axis=-1)  # [n, 4]
        k = self.param("k", nn.initializers.ones, (4, self.dim))
        return base @ k


def _tok():
    return CLIPTokenizer([("c", "a"), ("ca", "t</w>")])


def test_prompt_engineered_embeddings_mean_of_normalised(tmp_path):
    tok = _tok()
    enc = StubTextEncoder()
    params = {"k": np.random.RandomState(0).randn(4, 8).astype(np.float32)}
    templates = ["a photo of a {}.", "a drawing of a {}.", "the {} thing."]
    fp = str(tmp_path / "bank.pkl")
    out = prompt_engineered_embeddings(
        enc, params, tok, ["cat", "dog"], templates=templates, fp=fp)

    # manual recomputation of the reference recipe
    for cat in ("cat", "dog"):
        texts = [t.format(cat) for t in templates]
        raw = np.asarray(enc.apply({"params": params}, tok.tokenize(texts)))
        raw = raw / np.linalg.norm(raw, axis=-1, keepdims=True)
        want = raw.mean(0)
        want = want / np.linalg.norm(want)
        np.testing.assert_allclose(out[cat], want, rtol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(out[cat]), 1.0, rtol=1e-5)

    with open(fp, "rb") as f:
        loaded = pickle.load(f)
    np.testing.assert_array_equal(loaded["cat"], out["cat"])


def test_plain_category_embeddings_unit_norm():
    tok = _tok()
    enc = StubTextEncoder()
    params = {"k": np.random.RandomState(1).randn(4, 8).astype(np.float32)}
    emb = plain_category_embeddings(enc, params, tok, ["cat", "cats"])
    assert emb.shape == (2, 8)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)
    assert not np.allclose(emb[0], emb[1])
