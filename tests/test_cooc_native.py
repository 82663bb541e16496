"""Native co-occurrence counter vs the numpy path."""

import numpy as np
import pytest

from movie_recommendation_engine_tpu.graph import builders


def _numpy_graph(u, m, num_movies, threshold):
    """Force the numpy path by using a cap larger than any group."""
    return builders.build_item_similarity_graph(
        u, m, num_movies, threshold=threshold,
        max_items_per_user=10_000,
    )


def test_native_matches_numpy():
    rng = np.random.default_rng(0)
    n = 5000
    u = np.sort(rng.integers(0, 120, n))
    m = rng.integers(0, 60, n)
    try:
        from movie_recommendation_engine_tpu.utils import cooc_native

        src, dst, w = cooc_native.count_cooccurrence(u, m, 60, threshold=2)
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"native toolchain unavailable: {e}")

    g_native = builders.build_item_similarity_graph(u, m, 60, threshold=2)
    g_numpy = _numpy_graph(u, m, 60, threshold=2)
    assert g_native.num_edges == g_numpy.num_edges
    for node in range(60):
        nb_a, w_a = g_native.neighbors(node)
        nb_b, w_b = g_numpy.neighbors(node)
        oa = np.argsort(nb_a)
        ob = np.argsort(nb_b)
        np.testing.assert_array_equal(nb_a[oa], nb_b[ob])
        np.testing.assert_allclose(w_a[oa], w_b[ob])


def test_native_excludes_self_pairs():
    # Duplicate (user, movie) rows must not create self-edges.
    u = np.array([0, 0, 0], dtype=np.int64)
    m = np.array([5, 5, 7], dtype=np.int64)
    try:
        from movie_recommendation_engine_tpu.utils import cooc_native

        src, dst, w = cooc_native.count_cooccurrence(u, m, 10, threshold=1)
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"native toolchain unavailable: {e}")
    assert not np.any(src == dst)
    # (5,7) counted twice (two 5s with one 7).
    k = {(int(a), int(b)): float(c) for a, b, c in zip(src, dst, w)}
    assert k == {(5, 7): 2.0}


def test_negative_threshold_keeps_all_pairs():
    """threshold <= 0 means no cutoff — it must not be cast to a huge
    unsigned value that silently drops every edge."""
    try:
        from movie_recommendation_engine_tpu.utils import cooc_native
        u = np.array([0, 0, 1, 1], dtype=np.int64)
        m = np.array([3, 5, 3, 5], dtype=np.int64)
        s_neg, d_neg, w_neg = cooc_native.count_cooccurrence(u, m, 10, -1)
        s_one, d_one, w_one = cooc_native.count_cooccurrence(u, m, 10, 1)
    except Exception as e:  # noqa: BLE001
        import pytest
        pytest.skip(f"native toolchain unavailable: {e}")
    np.testing.assert_array_equal(s_neg, s_one)
    np.testing.assert_array_equal(d_neg, d_one)
    np.testing.assert_array_equal(w_neg, w_one)
    assert s_one.tolist() == [3] and d_one.tolist() == [5]
    assert w_one.tolist() == [2.0]
