"""Distributed exact retrieval over the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from movie_recommendation_engine_tpu.parallel import mesh as mesh_mod
from movie_recommendation_engine_tpu.retrieval import sharded


@pytest.fixture(scope="module")
def mesh8():
    return mesh_mod.make_mesh((2, 4))


def test_sharded_topk_matches_dense(mesh8):
    rng = np.random.default_rng(0)
    n, d, q = 64, 16, 5
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    queries = emb[rng.choice(n, q, replace=False)]

    emb_sharded, orig = sharded.shard_embeddings(mesh8, emb)
    scores, idx = sharded.sharded_similarity_topk(
        mesh8, emb_sharded, jnp.asarray(queries), k=7
    )
    scores, idx = np.asarray(scores), np.asarray(idx)

    dense = queries @ emb.T
    ref_idx = np.argsort(-dense, axis=1)[:, :7]
    for r in range(q):
        assert set(idx[r]) == set(ref_idx[r]), r
        np.testing.assert_allclose(
            scores[r], np.sort(dense[r])[::-1][:7], atol=1e-5
        )


def test_sharded_topk_k_larger_than_chunk(mesh8):
    rng = np.random.default_rng(1)
    n, d = 16, 8   # chunk = 4 rows/shard on the 4-way model axis
    emb = rng.standard_normal((n, d)).astype(np.float32)
    queries = emb[:2]
    emb_sharded, _ = sharded.shard_embeddings(mesh8, emb)
    scores, idx = sharded.sharded_similarity_topk(
        mesh8, emb_sharded, jnp.asarray(queries), k=4
    )
    dense = queries @ emb.T
    ref_idx = np.argsort(-dense, axis=1)[:, :4]
    for r in range(2):
        assert set(np.asarray(idx)[r]) == set(ref_idx[r])
