"""Sharded retrieval top-k over an 8-device CPU mesh matches the single-
device result; mesh/TP sharding rules sanity."""
import numpy as np

import jax
import jax.numpy as jnp

from zutis_tpu.parallel import create_mesh, param_partition_spec
from zutis_tpu.retrieval.bank import topk_local, topk_sharded


def test_sharded_topk_matches_local():
    rng = np.random.RandomState(0)
    C, D, N, k = 5, 16, 203, 7  # N deliberately not divisible by 8
    text = rng.randn(C, D).astype(np.float32)
    bank = rng.randn(N, D).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)

    mesh = create_mesh({"data": 8})
    vals_s, idx_s = topk_sharded(text, bank, k, mesh)

    vals_l, idx_l = jax.jit(topk_local, static_argnums=2)(
        jnp.asarray(text), jnp.asarray(bank), k)
    np.testing.assert_allclose(vals_s, np.asarray(vals_l), rtol=1e-5,
                               atol=1e-6)
    # indices may differ on exact ties; compare the score sets instead
    sims = text @ bank.T
    for c in range(C):
        got = np.sort(sims[c, idx_s[c]])
        want = np.sort(sims[c, np.asarray(idx_l)[c]])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_param_partition_rules():
    from jax.sharding import PartitionSpec as P

    assert param_partition_spec("encoder/resblocks_0/attn/q_proj/kernel") == \
        P(None, "model")
    assert param_partition_spec("encoder/resblocks_0/attn/out_proj/kernel") \
        == P("model", None)
    assert param_partition_spec("decoder/layers_1/linear1/kernel") == \
        P(None, "model")
    assert param_partition_spec("encoder/positional_embedding") == P()
    assert param_partition_spec("ffn1/layers_0/kernel") == P(None, "model")
    assert param_partition_spec("ffn1/layers_2/kernel") == P()
