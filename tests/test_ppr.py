"""PPR sampler tests: conservation, known-graph values, top-neighbor API."""

import jax.numpy as jnp
import numpy as np

from movie_recommendation_engine_tpu.graph.csr import csr_from_edge_index
from movie_recommendation_engine_tpu.sampling import ppr
from movie_recommendation_engine_tpu.sampling.random_walk import device_graph


def test_ppr_two_node_cycle():
    # 0 <-> 1. Analytic PPR from 0 with alpha, T iterations:
    # mass alternates between the two nodes.
    ei = np.array([[0, 1], [1, 0]])
    csr = csr_from_edge_index(ei, None, num_nodes=2)
    g = device_graph(csr)
    alpha = 0.15
    iters = 30
    scores = np.asarray(
        ppr.ppr_scores(g, jnp.array([0], jnp.int32), 2, alpha=alpha,
                       num_iterations=iters)
    )[0]
    # Closed form: ppr0 = alpha * sum_k even (1-a)^k, ppr1 = alpha * sum odd.
    beta = 1 - alpha
    ppr0 = alpha * sum(beta ** k for k in range(0, iters, 2))
    ppr1 = alpha * sum(beta ** k for k in range(1, iters, 2))
    np.testing.assert_allclose(scores, [ppr0, ppr1], atol=1e-5)
    # Total mass converges to 1 as iterations grow.
    assert abs(scores.sum() - (1 - beta ** iters)) < 1e-5


def test_ppr_respects_weights():
    # 0 -> 1 (w=3), 0 -> 2 (w=1): one iteration pushes 3:1.
    ei = np.array([[0, 0], [1, 2]])
    w = np.array([3.0, 1.0], dtype=np.float32)
    csr = csr_from_edge_index(ei, w, num_nodes=3)
    g = device_graph(csr)
    scores = np.asarray(
        ppr.ppr_scores(g, jnp.array([0], jnp.int32), 3, alpha=0.15,
                       num_iterations=2)
    )[0]
    assert scores[1] / scores[2] == np.float32(3.0)


def test_precompute_top_neighbors():
    ei = np.array([[0, 0, 1, 2], [1, 2, 0, 0]])
    w = np.array([3.0, 1.0, 1.0, 1.0], dtype=np.float32)
    csr = csr_from_edge_index(ei, w, num_nodes=3)
    g = device_graph(csr)
    top = ppr.precompute_top_neighbors(csr, g, np.array([0]), num_neighbors=2)
    nbrs, weights = top[0]
    assert len(nbrs) == 2
    np.testing.assert_allclose(sum(weights), 1.0, atol=1e-5)
    # Source itself carries the most PPR mass (teleport term).
    assert nbrs[0] == 0


def test_ppr_neighborhood_tables_shape_and_weights():
    ei = np.array([[0, 0, 1, 2, 3], [1, 2, 0, 0, 0]])
    w = np.array([3.0, 1.0, 1.0, 1.0, 2.0], dtype=np.float32)
    csr = csr_from_edge_index(ei, w, num_nodes=5)   # node 4 isolated
    g = device_graph(csr)
    tables = ppr.all_node_neighborhood_tables_ppr(
        g, num_layers=2, num_neighbors=3, num_nodes=5, batch=2)
    assert len(tables) == 2
    nbrs, weights = (np.asarray(t) for t in tables[0])
    assert nbrs.shape == (5, 3) and weights.shape == (5, 3)
    # Deterministic: both layers share the table.
    np.testing.assert_array_equal(np.asarray(tables[1][0]), nbrs)
    # The source keeps its teleport mass (reference semantics: no
    # self-exclusion) — it always appears in its own top-K. It ranks FIRST
    # only when return mass flows back (node 0's cycle, node 4's isolation);
    # a zero-in-degree node like 3 pours its mass into its neighbor.
    assert all(i in nbrs[i] for i in range(5))
    assert nbrs[0, 0] == 0 and nbrs[4, 0] == 4
    # Weights renormalize over valid slots; sentinel slots carry 0.
    sums = weights.sum(axis=1)
    np.testing.assert_allclose(sums[sums > 0], 1.0, atol=1e-5)
    assert (weights[nbrs == 5] == 0).all()


def test_ppr_tables_restrict_below():
    # Targets >= restrict_below must never be ranked (movie-only pooling).
    ei = np.array([[0, 0, 1, 2], [1, 2, 0, 0]])
    csr = csr_from_edge_index(ei, None, num_nodes=3)
    g = device_graph(csr)
    tables = ppr.all_node_neighborhood_tables_ppr(
        g, num_layers=1, num_neighbors=3, num_nodes=3, restrict_below=2)
    nbrs, weights = (np.asarray(t) for t in tables[0])
    valid = nbrs < 3
    assert (nbrs[valid] < 2).all()


def test_trainer_ppr_strategy_end_to_end(tmp_path):
    from movie_recommendation_engine_tpu import small_test_config
    from movie_recommendation_engine_tpu.graph import dataset
    from movie_recommendation_engine_tpu.train.trainer import Trainer

    cfg = small_test_config()
    cfg.train.epochs = 2
    cfg.walk.strategy = "ppr"
    cfg.walk.ppr_iterations = 4
    cfg.paths.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.paths.output_dir = str(tmp_path / "out")
    data = dataset.load(cfg)
    tr = Trainer(cfg, data)
    result = tr.fit()
    assert all(np.isfinite(h["loss"]) for h in result["history"])
    emb = np.asarray(tr.movie_embeddings())
    assert np.isfinite(emb).all()


def test_ppr_mass_conserved_with_dangling_nodes():
    """Isolated/sink residual is absorbed once (teleport) then dropped —
    reference push semantics (random_walk.py:173-189); total ppr <= 1."""
    import jax.numpy as jnp

    from movie_recommendation_engine_tpu.graph.csr import csr_from_edge_index
    from movie_recommendation_engine_tpu.sampling import ppr as ppr_mod
    from movie_recommendation_engine_tpu.sampling import random_walk as rw

    # 0 -> 1 -> 2 (sink); 3 isolated.
    edges = np.array([[0, 1], [1, 2]]).T
    csr = csr_from_edge_index(edges, np.ones(2, np.float32), num_nodes=4)
    g = rw.device_graph(csr)
    scores = np.asarray(ppr_mod.ppr_scores(
        g, jnp.asarray([0, 3], jnp.int32), 4, alpha=0.15, num_iterations=20,
    ))
    assert scores.shape == (2, 4)
    assert scores.sum(axis=1).max() <= 1.0 + 1e-5
    # Isolated source: exactly one teleport absorption.
    np.testing.assert_allclose(scores[1, 3], 0.15, atol=1e-6)
    assert scores[1, [0, 1, 2]].max() == 0.0
    # Chain source: mass decays along the chain, sink doesn't blow up.
    assert scores[0, 0] > scores[0, 1] > 0
