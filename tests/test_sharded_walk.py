"""Row-sharded CSR walks: bit-identical to the replicated walk, sharded
storage, and transparent through the Trainer's mesh path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from movie_recommendation_engine_tpu.graph.csr import csr_from_edge_index
from movie_recommendation_engine_tpu.parallel import mesh as mesh_mod
from movie_recommendation_engine_tpu.sampling import random_walk as rw
from movie_recommendation_engine_tpu.sampling import sharded_walk as sw


@pytest.fixture(scope="module")
def mesh42():
    return mesh_mod.make_mesh((4, 2))


@pytest.fixture(scope="module")
def csr_graph(rng):
    n, e = 203, 2000                      # deliberately not divisible by 2
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32) + 0.05
    # A few isolated nodes so halted-walker handling is exercised.
    mask = (src % 97 != 0)
    csr = csr_from_edge_index(
        np.stack([src[mask], dst[mask]]), w[mask], num_nodes=n)
    return csr


def test_sharded_walks_bit_identical(mesh42, csr_graph):
    """Same key -> same uniforms -> same binary-search outcomes: the
    masked-psum sharded walk must reproduce the replicated walk EXACTLY,
    halted sentinels included."""
    g_rep = rw.device_graph(csr_graph)
    g_sh = sw.sharded_device_graph(csr_graph, mesh42, axis="model")
    n_iters = rw.search_iters(csr_graph)
    starts = jnp.asarray(
        np.random.default_rng(1).integers(0, csr_graph.num_nodes, 64),
        jnp.int32)
    for seed in (0, 7):
        key = jax.random.PRNGKey(seed)
        v_rep = np.asarray(rw.random_walks(g_rep, starts, key, 11, 3, n_iters))
        v_sh = np.asarray(rw.random_walks(g_sh, starts, key, 11, 3, n_iters))
        np.testing.assert_array_equal(v_rep, v_sh)


def test_sharded_storage_is_actually_sharded(mesh42, csr_graph):
    """Each device holds one shard's slice — per-device CSR bytes drop by
    the model-axis size (the point of the exercise)."""
    g_sh = sw.sharded_device_graph(csr_graph, mesh42, axis="model")
    model_size = mesh42.shape["model"]
    for arr in (g_sh.indptr, g_sh.indices, g_sh.cumprob, g_sh.weights):
        assert arr.shape[0] == model_size
        shard_shapes = {s.data.shape for s in arr.addressable_shards}
        assert shard_shapes == {(1, arr.shape[1])}
    assert g_sh.num_nodes == csr_graph.num_nodes
    assert g_sh.sentinel == csr_graph.num_nodes


def test_sharded_neighborhood_tables_match(mesh42, csr_graph):
    """all_node_neighborhood_tables dispatches through random_walks, so the
    refresh path produces identical tables on either graph form."""
    g_rep = rw.device_graph(csr_graph)
    g_sh = sw.sharded_device_graph(csr_graph, mesh42, axis="model")
    n_iters = rw.search_iters(csr_graph)
    key = jax.random.PRNGKey(3)
    t_rep = rw.all_node_neighborhood_tables(
        g_rep, key, 2, 10, 2, 5, n_iters, batch=64)
    t_sh = rw.all_node_neighborhood_tables(
        g_sh, key, 2, 10, 2, 5, n_iters, batch=64)
    for (nb_r, w_r), (nb_s, w_s) in zip(t_rep, t_sh):
        np.testing.assert_array_equal(np.asarray(nb_r), np.asarray(nb_s))
        np.testing.assert_array_equal(np.asarray(w_r), np.asarray(w_s))


def test_sharded_ppr_scores_match(mesh42, csr_graph):
    """Sharded PPR pushes along local edge slices + frontier psum; scores
    equal the replicated power iteration to float tolerance."""
    from movie_recommendation_engine_tpu.sampling import ppr

    g_rep = rw.device_graph(csr_graph)
    g_sh = sw.sharded_device_graph(csr_graph, mesh42, axis="model")
    n = csr_graph.num_nodes
    sources = jnp.asarray([0, 3, 50, 199], jnp.int32)
    s_rep = np.asarray(ppr.ppr_scores(g_rep, sources, n, num_iterations=6))
    s_sh = np.asarray(ppr.ppr_scores(g_sh, sources, n, num_iterations=6))
    np.testing.assert_allclose(s_rep, s_sh, atol=1e-6)
    # Mass conservation carries over: total ppr mass per source <= 1.
    assert (s_sh.sum(axis=1) <= 1.0 + 1e-5).all()


def test_trainer_mesh_ppr_strategy_sharded(tiny_data, tmp_path):
    """walk.strategy=ppr under the mesh trains on the sharded graph."""
    from movie_recommendation_engine_tpu.train.trainer import Trainer

    cfg, data = tiny_data
    cfg = cfg.override({
        "train.epochs": 1, "train.max_pairs_per_epoch": 64,
        "train.batch_size": 32, "walk.strategy": "ppr",
        "walk.ppr_batch": 64, "mesh.shard_tables": True,
        "paths.checkpoint_dir": str(tmp_path / "p"),
    })
    cfg.mesh.mesh_shape = (2, 4)
    tr = Trainer(cfg, data)
    assert isinstance(tr.graph, sw.ShardedDeviceGraph)
    out = tr.fit()
    assert np.isfinite(out["history"][0]["loss"])


def test_trainer_mesh_shards_graph_and_matches(tiny_data, tmp_path):
    """Trainer with mesh+shard_tables row-shards the CSR (shard_graph
    default) and the run matches the replicated-graph run exactly — the
    walks are bit-identical, so this is a strict regression lock, not a
    tolerance check."""
    from movie_recommendation_engine_tpu.train.trainer import Trainer

    cfg, data = tiny_data
    base = {
        "train.epochs": 1, "train.max_pairs_per_epoch": 128,
        "train.batch_size": 32,
    }
    cfg_s = cfg.override({**base, "mesh.shard_tables": True,
                          "paths.checkpoint_dir": str(tmp_path / "s")})
    cfg_s.mesh.mesh_shape = (2, 4)
    cfg_r = cfg.override({**base, "mesh.shard_tables": True,
                          "mesh.shard_graph": False,
                          "paths.checkpoint_dir": str(tmp_path / "r")})
    cfg_r.mesh.mesh_shape = (2, 4)

    tr_s = Trainer(cfg_s, data)
    assert isinstance(tr_s.graph, sw.ShardedDeviceGraph)
    out_s = tr_s.fit()
    tr_r = Trainer(cfg_r, data)
    assert isinstance(tr_r.graph, rw.DeviceGraph)
    out_r = tr_r.fit()
    assert out_s["history"][0]["loss"] == pytest.approx(
        out_r["history"][0]["loss"], abs=1e-6)
    np.testing.assert_allclose(np.asarray(tr_s.movie_embeddings()),
                               np.asarray(tr_r.movie_embeddings()),
                               atol=1e-6)
