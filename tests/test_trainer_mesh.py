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
