"""Block-sparse pooling (ops/block_sparse.py): exactness, drops, grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from movie_recommendation_engine_tpu.models import pinsage
from movie_recommendation_engine_tpu.ops import block_sparse as bsp


def _tables(n=300, k=7, d=16, limit=None, seed=0):
    rng = np.random.default_rng(seed)
    nbrs = rng.integers(0, n + 5, (n, k)).astype(np.int32)  # some sentinels
    w = rng.random((n, k)).astype(np.float32)
    h = rng.standard_normal((n, d)).astype(np.float32)
    return nbrs, w, h


@pytest.mark.parametrize("block_size", [64, 128])
def test_block_pool_exact_when_all_blocks_kept(block_size):
    n = 300
    nbrs, w, h = _tables(n=n)
    perm = np.random.default_rng(1).permutation(n).astype(np.int32)
    bp, stats = bsp.build_block_pool(
        nbrs, w, perm, valid_limit=n, block_size=block_size,
        max_blocks=10_000, dtype=jnp.float32,
    )
    assert stats["dropped_mass"] == 0.0
    got = np.asarray(bsp.block_pool_matmul(bp, jnp.asarray(h), dtype=jnp.float32))
    want = np.asarray(pinsage.importance_pool(
        jnp.asarray(h), jnp.asarray(nbrs), jnp.asarray(w),
        valid_limit=n, dtype=jnp.float32,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_block_pool_valid_limit_masks_users():
    """ids >= valid_limit (user nodes / sentinels) contribute nothing."""
    n, limit = 200, 150
    nbrs, w, h = _tables(n=n)
    perm = np.arange(n, dtype=np.int32)
    bp, stats = bsp.build_block_pool(
        nbrs, w, perm, valid_limit=limit, block_size=64,
        max_blocks=10_000, dtype=jnp.float32,
    )
    got = np.asarray(bsp.block_pool_matmul(bp, jnp.asarray(h), dtype=jnp.float32))
    want = np.asarray(pinsage.importance_pool(
        jnp.asarray(h), jnp.asarray(nbrs), jnp.asarray(w),
        valid_limit=limit, dtype=jnp.float32,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_block_pool_drop_renormalizes():
    """With bmax=1 most rows lose neighbors: kept weights renormalize to a
    row-stochastic pool (rows with any kept mass sum A to ~1)."""
    n = 256
    nbrs, w, h = _tables(n=n)
    perm = np.arange(n, dtype=np.int32)
    bp, stats = bsp.build_block_pool(
        nbrs, w, perm, valid_limit=n, block_size=32, max_blocks=1,
        dtype=jnp.float32,
    )
    assert 0.0 < stats["dropped_mass"] < 1.0
    a = np.asarray(bp.a_blocks)  # [R, 1, bs, cs]
    row_sums = a.sum(axis=(1, 3)).reshape(-1)[:n]
    nz = row_sums > 0
    np.testing.assert_allclose(row_sums[nz], 1.0, rtol=1e-4)


def test_block_pool_gradients_flow():
    n = 128
    nbrs, w, h = _tables(n=n, d=8)
    perm = np.arange(n, dtype=np.int32)
    bp, _ = bsp.build_block_pool(nbrs, w, perm, valid_limit=n, block_size=32,
                                 max_blocks=10_000, dtype=jnp.float32)

    def loss(hh):
        return jnp.sum(bsp.block_pool_matmul(bp, hh, dtype=jnp.float32) ** 2)

    g = jax.grad(loss)(jnp.asarray(h))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0

    # Matches the gather form's gradient.
    def loss_ref(hh):
        return jnp.sum(pinsage.importance_pool(
            hh, jnp.asarray(nbrs), jnp.asarray(w), valid_limit=n,
            dtype=jnp.float32) ** 2)

    g_ref = jax.grad(loss_ref)(jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_mass_permutation_is_permutation_and_hubs_lead():
    n, k = 400, 6
    rng = np.random.default_rng(7)
    # One hub column (id 123) appears in half of all rows with high weight.
    nbrs = rng.integers(0, n, (n, k)).astype(np.int32)
    nbrs[::2, 0] = 123
    w = rng.random((n, k)).astype(np.float32)
    w[::2, 0] = 10.0
    perm = bsp.mass_permutation(nbrs, w, valid_limit=n)
    assert sorted(perm.tolist()) == list(range(n))
    assert perm[0] == 123  # the hub leads the order


def test_cluster_permutation_is_permutation():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 12)).astype(np.float32)
    perm = bsp.cluster_permutation(x, num_clusters=8)
    assert sorted(perm.tolist()) == list(range(500))


def test_cluster_permutation_concentrates_blocks():
    """The functional property the tiling needs: on a community graph
    (neighbors share a feature blob, blobs interleaved in original id
    order), the clustered ordering keeps ~all pooling mass inside a small
    per-row-block budget where the identity ordering drops plenty."""
    rng = np.random.default_rng(1)
    n, k, n_blobs = 1024, 8, 8
    labels = np.arange(n) % n_blobs          # interleaved communities
    centers = rng.standard_normal((n_blobs, 16)) * 10
    x = (centers[labels] + 0.05 * rng.standard_normal((n, 16))).astype(np.float32)
    members = [np.flatnonzero(labels == b) for b in range(n_blobs)]
    nbrs = np.stack([
        rng.choice(members[labels[i]], size=k) for i in range(n)
    ]).astype(np.int32)
    w = rng.random((n, k)).astype(np.float32)

    ident = np.arange(n, dtype=np.int32)
    _, stats_id = bsp.build_block_pool(nbrs, w, ident, valid_limit=n,
                                       block_size=64, max_blocks=3)
    perm = bsp.cluster_permutation(x)  # default oversegmented clustering
    bp, stats_cl = bsp.build_block_pool(nbrs, w, perm, valid_limit=n,
                                        block_size=64, max_blocks=3)
    assert stats_id["dropped_mass"] > 0.3       # interleaving breaks tiling
    assert stats_cl["dropped_mass"] < 0.02      # clustering concentrates it
    # And the clustered pool still reproduces the gather form closely.
    h = rng.standard_normal((n, 8)).astype(np.float32)
    got = np.asarray(bsp.block_pool_matmul(bp, jnp.asarray(h), dtype=jnp.float32))
    want = np.asarray(pinsage.importance_pool(
        jnp.asarray(h), jnp.asarray(nbrs), jnp.asarray(w),
        valid_limit=n, dtype=jnp.float32))
    err = np.abs(got - want).max()
    assert err < 0.05  # only the dropped tail differs
