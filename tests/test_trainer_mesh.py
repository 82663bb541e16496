"""Trainer on a device mesh: dp + row-sharded tables, numerics match the
single-device trainer."""

import numpy as np
import pytest

from movie_recommendation_engine_tpu import small_test_config
from movie_recommendation_engine_tpu.graph import dataset
from movie_recommendation_engine_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def cfg_data(tmp_path_factory):
    cfg = small_test_config()
    cfg.train.epochs = 1
    cfg.train.max_pairs_per_epoch = 128
    cfg.train.batch_size = 32
    data = dataset.load(cfg)
    return cfg, data


def _fit(cfg, data, tmp, mesh_shape, shard_tables, pool_impl="auto"):
    cfg = cfg.override({
        "mesh.shard_tables": shard_tables,
        "paths.checkpoint_dir": str(tmp),
        "model.pool_impl": pool_impl,
    })
    cfg.mesh.mesh_shape = mesh_shape
    tr = Trainer(cfg, data)
    out = tr.fit()
    return out["history"][0]["loss"], np.asarray(tr.movie_embeddings())


def test_mesh_trainer_matches_single_device(cfg_data, tmp_path):
    cfg, data = cfg_data
    loss1, emb1 = _fit(cfg, data, tmp_path / "a", None, False)
    loss4, emb4 = _fit(cfg, data, tmp_path / "b", (4, 2), False)
    # Same seeds, same program, different partitioning: results must agree
    # to float tolerance (collectives reorder reductions slightly).
    assert abs(loss1 - loss4) < 1e-3
    cos = (emb1 * emb4).sum(axis=1)
    assert cos.min() > 0.999


def test_mesh_trainer_row_sharded_tables(cfg_data, tmp_path):
    cfg, data = cfg_data
    loss1, emb1 = _fit(cfg, data, tmp_path / "c", None, False)
    loss_s, emb_s = _fit(cfg, data, tmp_path / "d", (2, 4), True)
    assert abs(loss1 - loss_s) < 1e-3
    cos = (emb1 * emb_s).sum(axis=1)
    assert cos.min() > 0.999
    assert emb_s.shape == emb1.shape


def test_mesh_trainer_hybrid_pooling(cfg_data, tmp_path):
    """Hybrid (dense prefix + gather final layer) under a mesh with
    row-sharded tables matches the unsharded gather trainer."""
    cfg, data = cfg_data
    loss_g, emb_g = _fit(cfg, data, tmp_path / "e", None, False, "gather")
    loss_h, emb_h = _fit(cfg, data, tmp_path / "f", (2, 4), True, "hybrid")
    assert abs(loss_g - loss_h) < 1e-3
    cos = (emb_g * emb_h).sum(axis=1)
    assert cos.min() > 0.999


def test_mesh_trainer_hub_pooling(cfg_data, tmp_path):
    """Hub pooling under a mesh (a_head + residual tables row-sharded over
    the model axis) matches the unsharded gather trainer."""
    cfg, data = cfg_data
    cfg_h = cfg.override({
        "model.hub_pool_head": 100_000,   # cover everything: exact
        "model.hub_pool_residual": 64,
    })
    loss_g, emb_g = _fit(cfg, data, tmp_path / "i", None, False, "gather")
    loss_h, emb_h = _fit(cfg_h, data, tmp_path / "j", (2, 4), True, "hub")
    assert abs(loss_g - loss_h) < 1e-3
    cos = (emb_g * emb_h).sum(axis=1)
    assert cos.min() > 0.999


def test_mesh_forces_xla_gather(cfg_data, tmp_path, monkeypatch):
    """gather_impl='auto' must never resolve to pallas when a mesh is
    configured — pl.pallas_call has no SPMD partitioning rule, so tracing it
    with row-sharded operands fails or replicates the full table per chip.
    MRE_USE_PALLAS=1 is the strongest pro-pallas setting auto honors (it
    resolves pallas on CPU, where these tests run); the mesh must win."""
    cfg, data = cfg_data
    monkeypatch.setenv("MRE_USE_PALLAS", "1")
    c1 = cfg.override({"paths.checkpoint_dir": str(tmp_path / "k")})
    tr1 = Trainer(c1, data)
    assert tr1.gather_impl == "pallas"  # the env var does force it unmeshed
    c2 = cfg.override({
        "mesh.shard_tables": True,
        "paths.checkpoint_dir": str(tmp_path / "l"),
    })
    c2.mesh.mesh_shape = (2, 4)
    tr2 = Trainer(c2, data)
    assert tr2.gather_impl == "xla"
    # The meshed trainer must also actually run a step with that choice.
    stats = tr2.train_epoch(0)
    assert np.isfinite(stats["loss"])
    # Explicit pallas + mesh downgrades (logged) instead of tracing pallas.
    c3 = cfg.override({
        "model.gather_impl": "pallas",
        "paths.checkpoint_dir": str(tmp_path / "m"),
    })
    c3.mesh.mesh_shape = (2, 4)
    tr3 = Trainer(c3, data)
    assert tr3.gather_impl == "xla"


def test_mesh_trainer_block_pooling(cfg_data, tmp_path):
    """Block-sparse pooling under a mesh (a_blocks row-sharded over the
    model axis when divisible) matches the unsharded gather trainer."""
    cfg, data = cfg_data
    cfg_b = cfg.override({
        "model.block_pool_block_size": 16,
        "model.block_pool_max_blocks": 10_000,  # exact
    })
    loss_g, emb_g = _fit(cfg, data, tmp_path / "g", None, False, "gather")
    loss_b, emb_b = _fit(cfg_b, data, tmp_path / "h", (2, 4), False, "block")
    assert abs(loss_g - loss_b) < 1e-3
    cos = (emb_g * emb_b).sum(axis=1)
    assert cos.min() > 0.999
