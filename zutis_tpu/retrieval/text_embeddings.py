"""Category text-embedding extraction with prompt engineering.

Behavioural contract (reference utils/extract_text_embeddings.py:98-141):
for each category, embed all 85 templated prompts with the CLIP text encoder,
L2-normalise each, average, L2-normalise the mean -> one fp32 embedding per
category. `category_text_embeddings` also covers the ZUTIS classifier head's
plain (template-free) embeddings (reference networks/zutis.py:35-38 uses the
raw category names, one prompt each, normalised).

Runs jitted on device in batches; tokenization is host-side BPE
(data/tokenizer.py). Results can be pickled to the reference's
{category: embedding} format."""
from __future__ import annotations

import functools
import pickle
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from zutis_tpu.data.tokenizer import CLIPTokenizer
from zutis_tpu.retrieval.prompts import PROMPT_TEMPLATES


@functools.lru_cache(maxsize=8)
def _jitted_apply(text_encoder):
    """One jitted apply per encoder config: a fresh jax.jit(lambda) per
    encode_texts call would retrace+recompile per call — at 919 categories
    x 85 templates that is 919 identical compiles of the (85, 77) batch.
    flax Modules are frozen/hashable, and equal configs share one compiled
    apply; the bounded LRU replaces an id()-keyed dict that pinned every
    encoder instance alive forever (ADVICE r4)."""
    return jax.jit(lambda p, t: text_encoder.apply({"params": p}, t))


def encode_texts(
    text_encoder, text_params, tokenizer: CLIPTokenizer, texts: List[str],
    batch_size: int = 256,
) -> np.ndarray:
    """-> [n, embed_dim] float32 (unnormalised CLIP text embeddings)."""
    tokens = tokenizer.tokenize(texts)
    apply = _jitted_apply(text_encoder)
    outs = []
    for i in range(0, len(tokens), batch_size):
        chunk = tokens[i:i + batch_size]
        pad = 0
        if len(chunk) < batch_size and len(tokens) > batch_size:
            pad = batch_size - len(chunk)
            chunk = np.pad(chunk, ((0, pad), (0, 0)))
        emb = np.asarray(apply(text_params, jnp.asarray(chunk)))
        outs.append(emb[:len(emb) - pad] if pad else emb)
    return np.concatenate(outs, axis=0).astype(np.float32)


def plain_category_embeddings(
    text_encoder, text_params, tokenizer: CLIPTokenizer,
    categories: List[str],
) -> np.ndarray:
    """ZUTIS classifier-head embeddings: raw category names, unit-norm
    (reference networks/zutis.py:35-38)."""
    emb = encode_texts(text_encoder, text_params, tokenizer, categories)
    return emb / np.linalg.norm(emb, axis=1, keepdims=True)


def prompt_engineered_embeddings(
    text_encoder, text_params, tokenizer: CLIPTokenizer,
    categories: List[str],
    templates: Optional[List[str]] = None,
    fp: Optional[str] = None,
) -> Dict[str, np.ndarray]:
    """Retrieval embeddings: 85-template mean (reference
    extract_text_embeddings.py:98-141). Optionally pickles to `fp` in the
    reference's {category: np.ndarray} format."""
    templates = PROMPT_TEMPLATES if templates is None else templates
    out: Dict[str, np.ndarray] = {}
    for category in categories:
        texts = [t.format(category) for t in templates]
        emb = encode_texts(text_encoder, text_params, tokenizer, texts)
        if len(templates) == 1:
            out[category] = emb[0]
        else:
            emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
            avg = emb.mean(axis=0)
            out[category] = (avg / np.linalg.norm(avg)).astype(np.float32)
    if fp is not None:
        with open(fp, "wb") as f:
            pickle.dump(out, f)
    return out
