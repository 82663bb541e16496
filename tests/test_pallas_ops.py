"""Pallas kernel tests (interpret mode on the CPU mesh; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from movie_recommendation_engine_tpu.ops.pallas import hamming, pool


def _ref_hamming(qsig, sigs, t, w):
    """Straight-numpy min-table Hamming distance."""
    q = np.asarray(qsig).reshape(qsig.shape[0], t, w)
    s = np.asarray(sigs).reshape(sigs.shape[0], t, w)
    x = np.bitwise_xor(q[:, None, :, :], s[None, :, :, :])
    pc = np.zeros(x.shape, dtype=np.int32)
    for bit in range(32):
        pc += (x >> np.uint32(bit)) & np.uint32(1)
    return pc.sum(-1).min(-1).astype(np.int32)


def test_hamming_kernel_matches_numpy():
    rng = np.random.default_rng(0)
    t, w = 3, 2
    qsig = jnp.asarray(rng.integers(0, 2**32, (5, t * w), dtype=np.uint32))
    sigs = jnp.asarray(rng.integers(0, 2**32, (37, t * w), dtype=np.uint32))
    out = hamming.hamming_distance(qsig, sigs, num_tables=t, words=w,
                                   tile_q=8, tile_n=16, interpret=True)
    ref = _ref_hamming(qsig, sigs, t, w)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_hamming_kernel_zero_distance_diagonal():
    rng = np.random.default_rng(1)
    t, w = 2, 1
    sigs = jnp.asarray(rng.integers(0, 2**32, (9, t * w), dtype=np.uint32))
    out = hamming.hamming_distance(sigs, sigs, num_tables=t, words=w,
                                   tile_q=8, tile_n=8, interpret=True)
    assert (np.diag(np.asarray(out)) == 0).all()


def test_hamming_topk_matches_xla_path():
    """The pallas-scored top-k must equal the XLA scan implementation in
    retrieval/lsh.py on identical signatures."""
    from movie_recommendation_engine_tpu.retrieval import lsh as lsh_mod

    rng = np.random.default_rng(2)
    t, w = 4, 2
    n, q = 64, 6
    sigs_flat = jnp.asarray(rng.integers(0, 2**32, (n, t * w), dtype=np.uint32))
    qsig_flat = jnp.asarray(rng.integers(0, 2**32, (q, t * w), dtype=np.uint32))

    d_pal, _ = hamming.hamming_topk(qsig_flat, sigs_flat, 5, num_tables=t,
                                    words=w, interpret=True)
    d_xla, _ = lsh_mod._hamming_topk(
        qsig_flat.reshape(q, t, w), sigs_flat.reshape(n, t, w), 5
    )
    np.testing.assert_array_equal(np.asarray(d_pal), np.asarray(d_xla))


def test_gather_pool_kernel_matches_numpy():
    """DMA-gather pooling kernel == masked einsum (sentinels contribute 0)."""
    rng = np.random.default_rng(3)
    n, d, b, k = 96, 256, 19, 11
    table = rng.standard_normal((n, d)).astype(np.float32)
    nbrs = rng.integers(0, n + 1, (b, k)).astype(np.int32)  # id==n: sentinel
    w = rng.random((b, k)).astype(np.float32)

    out = pool.gather_pool(jnp.asarray(table), jnp.asarray(nbrs),
                           jnp.asarray(w), valid_limit=n, tile_b=4,
                           interpret=True)
    mask = (nbrs < n).astype(np.float32)
    ref = np.einsum("bk,bkd->bd", w * mask, table[np.minimum(nbrs, n - 1)])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_gather_pool_kernel_matches_importance_pool():
    """Kernel == models.pinsage.importance_pool on pre-normalized weights.

    importance_pool renormalizes over the valid set; feeding it already-
    normalized weights makes the two formulations identical."""
    from movie_recommendation_engine_tpu.models.pinsage import importance_pool

    rng = np.random.default_rng(4)
    n, d, b, k = 64, 128, 9, 7
    table = rng.standard_normal((n, d)).astype(np.float32)
    nbrs = rng.integers(0, n + 1, (b, k)).astype(np.int32)
    w = rng.random((b, k)).astype(np.float32)
    mask = (nbrs < n).astype(np.float32)
    w_norm = w * mask
    denom = w_norm.sum(1, keepdims=True)
    w_norm = np.where(denom > 0, w_norm / np.maximum(denom, 1e-12), 0.0)

    out_kernel = pool.gather_pool(jnp.asarray(table), jnp.asarray(nbrs),
                                  jnp.asarray(w_norm.astype(np.float32)),
                                  valid_limit=n, tile_b=8, interpret=True)
    out_ref = importance_pool(jnp.asarray(table), jnp.asarray(nbrs),
                              jnp.asarray(w), valid_limit=n,
                              dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_ref),
                               atol=1e-4)


def test_gather_pool_ad_gradients_match_xla():
    """The custom-VJP kernel wrapper must produce the same table/weight
    gradients as the plain XLA gather+einsum formulation."""
    rng = np.random.default_rng(5)
    n, d, b, k = 48, 64, 7, 5
    table = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    nbrs = jnp.asarray(rng.integers(0, n + 1, (b, k)).astype(np.int32))
    w = jnp.asarray(rng.random((b, k)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))

    def loss_pallas(t, ww):
        out = pool.gather_pool_ad(t, nbrs, ww, n, 4, True)
        return jnp.sum(out * cot)

    def loss_xla(t, ww):
        mask = (nbrs >= 0) & (nbrs < n)
        wm = jnp.where(mask, ww, 0.0)
        feats = jnp.take(t, jnp.clip(nbrs, 0, n - 1), axis=0)
        out = jnp.einsum("bk,bkd->bd", wm, feats)
        return jnp.sum(out * cot)

    gt_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(table, w)
    gt_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(table, w)
    np.testing.assert_allclose(np.asarray(gt_p), np.asarray(gt_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x), atol=1e-4)


def test_importance_pool_pallas_impl_matches_xla():
    """importance_pool(impl="pallas") == importance_pool(impl="xla") —
    value AND gradient through the model's actual pooling entry point."""
    from movie_recommendation_engine_tpu.models.pinsage import importance_pool

    rng = np.random.default_rng(6)
    n, d, b, k = 40, 32, 6, 4
    table = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    nbrs = jnp.asarray(rng.integers(0, n + 1, (b, k)).astype(np.int32))
    w = jnp.asarray(rng.random((b, k)).astype(np.float32))

    def run(impl):
        def loss(t):
            out = importance_pool(t, nbrs, w, valid_limit=n,
                                  dtype=jnp.float32, impl=impl)
            return jnp.sum(out ** 2)

        val, grad = jax.value_and_grad(loss)(table)
        return np.asarray(val), np.asarray(grad)

    v_p, g_p = run("pallas")   # interpret mode on CPU (backend != tpu)
    v_x, g_x = run("xla")
    np.testing.assert_allclose(v_p, v_x, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(g_p, g_x, atol=1e-4)


def test_gather_pool_ragged_table_and_bf16_sublanes():
    """The sublane-window DMA path: N not a multiple of the tiling (8 for
    f32, 16 for bf16) pads the table internally; rows in the ragged tail
    must still pool exactly (real-silicon alignment findings, RESULTS.md
    'Pallas on real silicon')."""
    rng = np.random.default_rng(11)
    for dtype, sub in ((np.float32, 8), (jnp.bfloat16, 16)):
        n, d, b, k = 2 * sub + 3, 128, 9, 5          # ragged tail of 3 rows
        table = rng.standard_normal((n, d)).astype(np.float32)
        # Force every query to hit the ragged tail AND the sentinel.
        nbrs = np.stack([
            np.array([n - 1, n - 2, n - 3, 0, n], dtype=np.int32)
            for _ in range(b)
        ])
        w = rng.random((b, k)).astype(np.float32)
        out = pool.gather_pool(jnp.asarray(table, dtype=dtype),
                               jnp.asarray(nbrs), jnp.asarray(w),
                               valid_limit=n, tile_b=4, interpret=True)
        mask = (nbrs < n).astype(np.float32)
        tbl = np.asarray(jnp.asarray(table, dtype=dtype).astype(jnp.float32))
        ref = np.einsum("bk,bkd->bd", w * mask, tbl[np.minimum(nbrs, n - 1)])
        tol = 1e-4 if dtype == np.float32 else 3e-2
        np.testing.assert_allclose(np.asarray(out), ref, atol=tol,
                                   err_msg=str(dtype))
