"""Model & loss tests: forward-path semantics, pooling masks, loss values
vs hand-computed references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from movie_recommendation_engine_tpu.models import aggregators, losses, pinsage


@pytest.fixture(scope="module")
def params():
    return pinsage.init_params(jax.random.PRNGKey(0), 16, 32, 8, num_layers=2)


def test_param_count_matches_reference_checkpoint():
    # The reference's shipped checkpoint (checkpoints/best_model.pt) totals
    # 591,744 parameters for in=128, hidden=256, out=128, 2 layers — verified
    # by summing its state_dict tensor sizes. (run.py:114 prints 313,216 for a
    # different configuration; the checkpoint is ground truth.)
    p = pinsage.init_params(jax.random.PRNGKey(0), 128, 256, 128, num_layers=2)
    assert pinsage.num_params(p) == 591744


def test_mlp_forward_unit_norm(params):
    x = jax.random.normal(jax.random.PRNGKey(1), (7, 16))
    emb = pinsage.mlp_forward(params, x, jnp.float32)
    assert emb.shape == (7, 8)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0, atol=1e-5)


def test_importance_pool_weighted_sum():
    h = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
    nbrs = jnp.array([[0, 1], [2, 3]], dtype=jnp.int32)
    w = jnp.array([[1.0, 3.0], [2.0, 2.0]])
    out = pinsage.importance_pool(h, nbrs, w, dtype=jnp.float32)
    want0 = 0.25 * h[0] + 0.75 * h[1]
    want1 = 0.5 * h[2] + 0.5 * h[3]
    np.testing.assert_allclose(np.asarray(out), np.stack([want0, want1]), atol=1e-5)


def test_importance_pool_masks_sentinel_and_renormalizes():
    h = jnp.eye(3, dtype=jnp.float32)
    sentinel = 3
    nbrs = jnp.array([[0, sentinel], [sentinel, sentinel]], dtype=jnp.int32)
    w = jnp.array([[0.5, 0.5], [0.5, 0.5]])
    out = pinsage.importance_pool(h, nbrs, w, dtype=jnp.float32)
    # Row 0: only neighbor 0 valid -> renormalized to weight 1.0.
    np.testing.assert_allclose(np.asarray(out[0]), [1.0, 0.0, 0.0], atol=1e-6)
    # Row 1: no valid neighbors -> zero vector (model/pinsage.py:116,133).
    np.testing.assert_allclose(np.asarray(out[1]), 0.0, atol=1e-6)


def test_importance_pool_valid_limit_drops_users():
    # valid_limit=2 reproduces dropping out-of-range (user) neighbors
    # (model/pinsage.py:124).
    h = jnp.eye(4, dtype=jnp.float32)
    nbrs = jnp.array([[1, 3]], dtype=jnp.int32)  # 3 is a "user" node
    w = jnp.array([[0.5, 0.5]])
    out = pinsage.importance_pool(h, nbrs, w, valid_limit=2, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out[0]), [0.0, 1.0, 0.0, 0.0], atol=1e-6)


def test_pooled_forward_batch_consistent_with_full(params):
    n, f = 10, 16
    x = jax.random.normal(jax.random.PRNGKey(2), (n, f))
    key = jax.random.PRNGKey(3)
    nbrs = jax.random.randint(key, (n, 4), 0, n).astype(jnp.int32)
    w = jnp.abs(jax.random.normal(key, (n, 4))) + 0.1
    full = pinsage.pooled_forward(params, x, [nbrs, nbrs], [w, w], dtype=jnp.float32)
    batch_nodes = jnp.array([2, 5, 7], dtype=jnp.int32)
    part = pinsage.pooled_forward_batch(
        params, x, [nbrs, nbrs], [w, w], batch_nodes, dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(part), np.asarray(full)[np.array([2, 5, 7])], atol=1e-5
    )


def test_edge_forward_matches_manual_segment_sum(params):
    n = 6
    x = jax.random.normal(jax.random.PRNGKey(4), (n, 16))
    src = jnp.array([0, 1, 2], dtype=jnp.int32)
    dst = jnp.array([1, 2, 0], dtype=jnp.int32)
    emb = pinsage.edge_forward(params, x, src, dst, dtype=jnp.float32)
    assert emb.shape == (n, 8)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0, atol=1e-5)


def test_dense_pool_matrix_matches_importance_pool():
    rng = np.random.default_rng(0)
    n, k, d = 12, 4, 8
    h = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    nbrs = jnp.asarray(rng.integers(0, n + 2, (n, k)).astype(np.int32))  # some sentinels
    w = jnp.asarray(rng.random((n, k)).astype(np.float32))
    a = pinsage.dense_pool_matrix(nbrs, w, num_cols=n, valid_limit=n,
                                  dtype=jnp.float32)
    dense = a @ h
    gathered = pinsage.importance_pool(h, nbrs, w, valid_limit=n,
                                       dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(gathered), atol=1e-5)
    # Row sums: 1 for rows with any valid neighbor, 0 otherwise.
    sums = np.asarray(a).sum(1)
    assert ((np.abs(sums - 1) < 1e-5) | (sums == 0)).all()


def test_dense_forward_matches_gather_forward(params):
    rng = np.random.default_rng(1)
    n, k = 10, 3
    x = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    nbrs = jnp.asarray(rng.integers(0, n, (n, k)).astype(np.int32))
    w = jnp.asarray(rng.random((n, k)).astype(np.float32))
    a = pinsage.dense_pool_matrix(nbrs, w, num_cols=n, dtype=jnp.float32)
    full_g = pinsage.pooled_forward(params, x, [nbrs, nbrs], [w, w],
                                    dtype=jnp.float32)
    full_d = pinsage.pooled_forward_dense(params, x, [a, a], dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(full_d), np.asarray(full_g), atol=1e-5)
    batch = jnp.array([1, 4, 7], dtype=jnp.int32)
    part_g = pinsage.pooled_forward_batch(params, x, [nbrs, nbrs], [w, w],
                                          batch, dtype=jnp.float32)
    part_d = pinsage.pooled_forward_batch_dense(params, x, [a, a], batch,
                                                dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(part_d), np.asarray(part_g), atol=1e-5)


def test_forward_dispatch(params):
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 16))
    mlp = pinsage.forward(params, x)
    assert mlp.shape == (4, 8)


@pytest.mark.parametrize("kind", ["mean", "weighted", "attention", "max",
                                  "importance", "importance_transform"])
def test_aggregator_zoo_shapes(kind):
    key = jax.random.PRNGKey(0)
    d = 8
    p = aggregators.init_aggregator_params(key, kind, d, d)
    h = jax.random.normal(key, (10, d))
    nbrs = jnp.array([[0, 1, 2], [3, 10, 10]], dtype=jnp.int32)  # 10 = sentinel
    w = jnp.array([[1.0, 2.0, 1.0], [1.0, 0.0, 0.0]])
    self_feats = h[:2]
    out = aggregators.aggregate(kind, p, h, nbrs, w, self_feats=self_feats,
                                dtype=jnp.float32)
    assert out.shape == (2, d)
    assert np.isfinite(np.asarray(out)).all()


def test_aggregator_empty_neighborhood_zero():
    h = jnp.ones((4, 8))
    nbrs = jnp.full((1, 3), 4, dtype=jnp.int32)
    w = jnp.zeros((1, 3))
    for kind in ["mean", "weighted", "importance", "max"]:
        p = aggregators.init_aggregator_params(jax.random.PRNGKey(0), kind, 8, 8)
        out = aggregators.aggregate(kind, p, h, nbrs, w, self_feats=h[:1],
                                    dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6,
                                   err_msg=f"aggregator {kind}")


# ---- losses ---------------------------------------------------------------

def test_max_margin_hand_value():
    # q·p = 1.0; negatives sims = {0.5, 0.9} -> max 0.9;
    # loss = relu(0.1 + 0.9 - 1.0) = 0.0 ; with margin 0.3 -> 0.2
    q = jnp.array([[1.0, 0.0]])
    p = jnp.array([[1.0, 0.0]])
    negs = jnp.array([[[0.5, 0.0], [0.9, 0.0]]])
    assert float(losses.max_margin_loss(q, p, negs, margin=0.1)) == pytest.approx(0.0)
    assert float(losses.max_margin_loss(q, p, negs, margin=0.3)) == pytest.approx(0.2, abs=1e-6)


def test_max_margin_shared_pool_matches_expanded():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (5, 8))
    p = jax.random.normal(jax.random.PRNGKey(1), (5, 8))
    pool = jax.random.normal(jax.random.PRNGKey(2), (7, 8))
    a = losses.shared_pool_max_margin_loss(q, p, pool, 0.1)
    expanded = jnp.broadcast_to(pool[None], (5, 7, 8))
    b = losses.max_margin_loss(q, p, expanded, 0.1)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-4, atol=1e-5)


def test_batch_hard_triplet():
    # Two orthogonal pairs -> hardest in-batch negative sim = 0
    # loss = relu(margin + 0 - 1) = 0 for margin < 1.
    q = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    p = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    assert float(losses.batch_hard_triplet_loss(q, p, 0.5)) == pytest.approx(0.0)


def test_curriculum_loss_schedule():
    q = jnp.array([[1.0, 0.0]])
    p = jnp.array([[0.0, 1.0]])  # pos_sim = 0
    rn = jnp.array([[1.0, 0.0]])  # neg sim 1 -> base = relu(0.1+1-0) = 1.1
    hn = jnp.array([[[1.0, 0.0]]])
    base = float(losses.curriculum_loss(q, p, rn, hn, epoch=0))
    assert base == pytest.approx(1.1, abs=1e-6)
    # epoch 5, max 10, factor 2 -> hard_weight = 1.0 -> total = 2.2
    total = float(losses.curriculum_loss(q, p, rn, hn, epoch=5, max_epochs=10,
                                         hard_negative_factor=2.0))
    assert total == pytest.approx(2.2, abs=1e-6)


def test_cosine_objective():
    q = jnp.array([[1.0, 0.0]])
    p = jnp.array([[1.0, 0.0]])
    assert float(losses.cosine_objective(q, p)) == pytest.approx(-1.0)


def test_nce_loss_hand_value():
    # q == p orthogonal to the single negative, t=1:
    # loss = -log(e^1 / (e^1 + e^0)) = log(1 + e^-1)
    q = jnp.array([[1.0, 0.0]])
    p = jnp.array([[1.0, 0.0]])
    pool = jnp.array([[0.0, 1.0]])
    got = float(losses.nce_loss(q, p, pool, temperature=1.0))
    assert got == pytest.approx(float(np.log(1 + np.exp(-1.0))), abs=1e-6)


def test_nce_loss_hard_negatives_increase_loss():
    key = jax.random.PRNGKey(0)
    q = pinsage.l2_normalize(jax.random.normal(key, (6, 8)))
    p = pinsage.l2_normalize(jax.random.normal(jax.random.PRNGKey(1), (6, 8)))
    pool = pinsage.l2_normalize(jax.random.normal(jax.random.PRNGKey(2), (10, 8)))
    base = float(losses.nce_loss(q, p, pool))
    # Hard negatives identical to the queries: maximally confusing.
    hard = jnp.repeat(q[:, None, :], 2, axis=1)
    harder = float(losses.nce_loss(q, p, pool, hard))
    assert harder > base


def test_nce_loss_decreases_with_alignment():
    pool = jnp.array([[0.0, 1.0], [0.7, 0.7]])
    q = jnp.array([[1.0, 0.0]])
    aligned = float(losses.nce_loss(q, q, pool))
    anti = float(losses.nce_loss(q, -q, pool))
    assert aligned < anti
