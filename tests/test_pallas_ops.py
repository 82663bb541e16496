"""Pallas kernel tests (interpret mode on the CPU mesh; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from movie_recommendation_engine_tpu.ops.pallas import hamming


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
