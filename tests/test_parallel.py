"""Multi-device tests on the 8-device virtual CPU mesh: explicit collectives,
sharded train step parity with the single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from movie_recommendation_engine_tpu.models import pinsage
from movie_recommendation_engine_tpu.parallel import collectives, mesh as mesh_mod
from movie_recommendation_engine_tpu.parallel.sharding import (
    ShardedStepConfig, make_sharded_train_step,
)
from movie_recommendation_engine_tpu.train import optim


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual devices"
    return mesh_mod.make_mesh((4, 2))


def test_make_mesh_axes(mesh8):
    assert mesh8.shape == {"data": 4, "model": 2}


def test_sharded_gather_matches_take(mesh8):
    n, d = 16, 8
    table = jnp.arange(n * d, dtype=jnp.float32).reshape(n, d)
    idx = jnp.array([0, 3, 7, 8, 15, 9], dtype=jnp.int32)
    out = collectives.sharded_gather(mesh8, table, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table)[np.asarray(idx)])


def test_ring_shift(mesh8):
    s, b, d = 2, 4, 4  # model axis size 2
    x = jnp.arange(s * b * d, dtype=jnp.float32).reshape(s, b, d)
    out = collectives.ring_shift(mesh8, x, shift=1)
    # Block i moves to position (i+1) mod S.
    np.testing.assert_allclose(np.asarray(out)[1], np.asarray(x)[0])
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(x)[1])


def test_sharded_step_matches_single_device(mesh8):
    """The sharded train step must produce the same loss and parameter
    update as the unsharded program."""
    rng = np.random.default_rng(0)
    n, f, h, e, k = 16, 8, 16, 8, 4
    x = rng.standard_normal((n, f)).astype(np.float32)
    nbrs = rng.integers(0, n, (n, k)).astype(np.int32)
    w = rng.random((n, k)).astype(np.float32)
    w /= w.sum(1, keepdims=True)

    params = pinsage.init_params(jax.random.PRNGKey(0), f, h, e, 2)
    opt_state = optim.adam_init(params)
    b = 8
    q = rng.integers(0, n, b).astype(np.int32)
    p = rng.integers(0, n, b).astype(np.int32)
    rn = rng.choice(n, 6, replace=False).astype(np.int32)
    hard = np.zeros((b, 1), np.int32)

    scfg = ShardedStepConfig(loss="max_margin", num_hard=0, valid_limit=n,
                             dtype=jnp.float32)
    compile_step = make_sharded_train_step(mesh8, scfg)
    step = compile_step(params, opt_state,
                        (jnp.asarray(nbrs), jnp.asarray(nbrs)),
                        (jnp.asarray(w), jnp.asarray(w)))
    p2, o2, loss_sharded = step(
        jax.tree_util.tree_map(np.asarray, params),
        jax.tree_util.tree_map(np.asarray, opt_state),
        x, (nbrs, nbrs), (w, w), (), q, p, rn, hard, np.float32(1e-3),
    )

    # Single-device reference computation.
    from movie_recommendation_engine_tpu.models import losses

    def loss_fn(params):
        all_nodes = jnp.concatenate([jnp.asarray(q), jnp.asarray(p), jnp.asarray(rn)])
        emb = pinsage.pooled_forward_batch(
            params, jnp.asarray(x), [jnp.asarray(nbrs)] * 2, [jnp.asarray(w)] * 2,
            all_nodes, valid_limit=n, dtype=jnp.float32,
        )
        return losses.shared_pool_max_margin_loss(
            emb[:b], emb[b:2 * b], emb[2 * b:], 0.1
        )

    loss_ref, grads = jax.value_and_grad(loss_fn)(params)
    p_ref, _ = optim.adam_update(grads, opt_state, params, 1e-3)

    np.testing.assert_allclose(float(loss_sharded), float(loss_ref), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(p2["output_proj"]["w"]), np.asarray(p_ref["output_proj"]["w"]),
        rtol=1e-4, atol=1e-6,
    )


def test_sharded_hybrid_pool_step_matches_single_device(mesh8):
    """Hybrid pooling (row-sharded [N, N] dense pool matrix for layer 0 +
    batch gather for the final layer) under the mesh must match the
    unsharded hybrid program — the flagship ML-25M-scale configuration."""
    rng = np.random.default_rng(1)
    n, f, h, e, k = 16, 8, 16, 8, 4
    x = rng.standard_normal((n, f)).astype(np.float32)
    nbrs = rng.integers(0, n, (n, k)).astype(np.int32)
    w = rng.random((n, k)).astype(np.float32)
    w /= w.sum(1, keepdims=True)
    a0 = np.asarray(pinsage.dense_pool_matrix(
        jnp.asarray(nbrs), jnp.asarray(w), num_cols=n, valid_limit=n,
        dtype=jnp.float32))

    params = pinsage.init_params(jax.random.PRNGKey(1), f, h, e, 2)
    opt_state = optim.adam_init(params)
    b = 8
    q = rng.integers(0, n, b).astype(np.int32)
    p = rng.integers(0, n, b).astype(np.int32)
    rn = rng.choice(n, 6, replace=False).astype(np.int32)
    hard = np.zeros((b, 1), np.int32)

    scfg = ShardedStepConfig(loss="max_margin", num_hard=0, valid_limit=n,
                             dtype=jnp.float32)
    compile_step = make_sharded_train_step(mesh8, scfg)
    step = compile_step(params, opt_state,
                        (jnp.asarray(nbrs), jnp.asarray(nbrs)),
                        (jnp.asarray(w), jnp.asarray(w)),
                        (jnp.asarray(a0),))
    p2, o2, loss_sharded = step(
        jax.tree_util.tree_map(np.asarray, params),
        jax.tree_util.tree_map(np.asarray, opt_state),
        x, (nbrs, nbrs), (w, w), (a0,), q, p, rn, hard, np.float32(1e-3),
    )

    from movie_recommendation_engine_tpu.models import losses

    def loss_fn(params):
        all_nodes = jnp.concatenate([jnp.asarray(q), jnp.asarray(p), jnp.asarray(rn)])
        emb = pinsage.pooled_forward_batch(
            params, jnp.asarray(x), [jnp.asarray(nbrs)] * 2, [jnp.asarray(w)] * 2,
            all_nodes, valid_limit=n, dtype=jnp.float32,
            pool_mats=(jnp.asarray(a0),),
        )
        return losses.shared_pool_max_margin_loss(
            emb[:b], emb[b:2 * b], emb[2 * b:], 0.1
        )

    loss_ref, grads = jax.value_and_grad(loss_fn)(params)
    p_ref, _ = optim.adam_update(grads, opt_state, params, 1e-3)

    np.testing.assert_allclose(float(loss_sharded), float(loss_ref), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(p2["output_proj"]["w"]), np.asarray(p_ref["output_proj"]["w"]),
        rtol=1e-4, atol=1e-6,
    )


def test_sharded_embed_with_pool_mats(mesh8):
    """sharded_embed_fn with a full set of row-sharded pool matrices must
    match the unsharded dense forward and come back row-sharded."""
    from movie_recommendation_engine_tpu.parallel.sharding import sharded_embed_fn

    rng = np.random.default_rng(2)
    n, f, h, e, k = 16, 8, 16, 8, 4
    x = rng.standard_normal((n, f)).astype(np.float32)
    nbrs = rng.integers(0, n, (n, k)).astype(np.int32)
    w = rng.random((n, k)).astype(np.float32)
    w /= w.sum(1, keepdims=True)
    a = np.asarray(pinsage.dense_pool_matrix(
        jnp.asarray(nbrs), jnp.asarray(w), num_cols=n, valid_limit=n,
        dtype=jnp.float32))
    params = pinsage.init_params(jax.random.PRNGKey(2), f, h, e, 2)

    scfg = ShardedStepConfig(valid_limit=n, dtype=jnp.float32)
    compile_embed = sharded_embed_fn(mesh8, scfg)
    embed = compile_embed(params, (jnp.asarray(nbrs),) * 2,
                          (jnp.asarray(w),) * 2, (jnp.asarray(a),) * 2)
    out = embed(params, x, (nbrs, nbrs), (w, w), (a, a))
    ref = pinsage.pooled_forward_dense(
        params, jnp.asarray(x), [jnp.asarray(a)] * 2, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pad_to_multiple():
    x = np.arange(10).reshape(5, 2)
    padded, orig = mesh_mod.pad_to_multiple(x, 4)
    assert padded.shape == (8, 2) and orig == 5
    assert (padded[5:] == 0).all()
