"""Hub-factorized pooling (ops/hub_pool.py): exactness, drops, grads,
trainer integration + the auto fallback chain."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from movie_recommendation_engine_tpu import small_test_config
from movie_recommendation_engine_tpu.core.logging import MetricsLogger
from movie_recommendation_engine_tpu.graph import dataset
from movie_recommendation_engine_tpu.models import pinsage
from movie_recommendation_engine_tpu.ops import hub_pool as hub
from movie_recommendation_engine_tpu.train.trainer import Trainer


def _tables(n=300, k=7, d=16, seed=0):
    rng = np.random.default_rng(seed)
    nbrs = rng.integers(0, n + 5, (n, k)).astype(np.int32)  # some sentinels
    w = rng.random((n, k)).astype(np.float32)
    h = rng.standard_normal((n, d)).astype(np.float32)
    return nbrs, w, h


def test_hub_pool_exact_when_head_covers_all():
    n = 300
    nbrs, w, h = _tables(n=n)
    hp, stats = hub.build_hub_pool(nbrs, w, valid_limit=n, head=n,
                                   residual=0, dtype=jnp.float32)
    assert stats["dropped_mass"] == pytest.approx(0.0, abs=1e-7)
    got = np.asarray(hub.hub_pool_matmul(hp, jnp.asarray(h), dtype=jnp.float32))
    want = np.asarray(pinsage.importance_pool(
        jnp.asarray(h), jnp.asarray(nbrs), jnp.asarray(w),
        valid_limit=n, dtype=jnp.float32,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_hub_pool_residual_covers_everything_exactly():
    """head=0-ish + residual >= K keeps every entry: exact again, through
    the gather half of the factorization."""
    n, k = 200, 5
    nbrs, w, h = _tables(n=n, k=k, seed=1)
    hp, stats = hub.build_hub_pool(nbrs, w, valid_limit=n, head=1,
                                   residual=k, dtype=jnp.float32)
    assert stats["dropped_mass"] == pytest.approx(0.0, abs=1e-7)
    got = np.asarray(hub.hub_pool_matmul(hp, jnp.asarray(h), dtype=jnp.float32))
    want = np.asarray(pinsage.importance_pool(
        jnp.asarray(h), jnp.asarray(nbrs), jnp.asarray(w),
        valid_limit=n, dtype=jnp.float32,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_hub_pool_valid_limit_masks_users():
    """ids >= valid_limit (user nodes / sentinels) contribute nothing."""
    n, limit = 200, 150
    nbrs, w, h = _tables(n=n, seed=2)
    hp, _ = hub.build_hub_pool(nbrs, w, valid_limit=limit, head=n,
                               residual=0, dtype=jnp.float32)
    got = np.asarray(hub.hub_pool_matmul(hp, jnp.asarray(h), dtype=jnp.float32))
    want = np.asarray(pinsage.importance_pool(
        jnp.asarray(h), jnp.asarray(nbrs), jnp.asarray(w),
        valid_limit=limit, dtype=jnp.float32,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # Rows whose head columns are users must get zero from them: check no
    # head id is >= limit.
    assert int(np.asarray(hp.head_ids).max()) < n
    assert (np.asarray(hp.a_head).sum(axis=1) <= 1.0 + 1e-4).all()


def test_hub_pool_drop_renormalizes():
    """With a tiny head + tiny residual, kept rows must be renormalized to
    sum 1 (rows with zero kept mass stay all-zero)."""
    n, k = 256, 9
    nbrs, w, _ = _tables(n=n, k=k, seed=3)
    hp, stats = hub.build_hub_pool(nbrs, w, valid_limit=n, head=16,
                                   residual=2, dtype=jnp.float32)
    assert 0.0 < stats["dropped_mass"] < 1.0
    row_sum = np.asarray(hp.a_head).sum(axis=1) + np.asarray(hp.res_w).sum(axis=1)
    nz = row_sum > 0
    np.testing.assert_allclose(row_sum[nz], 1.0, atol=1e-4)


def test_hub_pool_pallas_residual_matches_xla():
    """gather_impl=pallas (interpret mode off-TPU) must reproduce the XLA
    residual path bit-for-near-bit, forward and backward."""
    n, d = 96, 8
    nbrs, w, h = _tables(n=n, k=5, d=d, seed=6)
    hp, _ = hub.build_hub_pool(nbrs, w, valid_limit=n, head=16, residual=3,
                               dtype=jnp.float32)
    hj = jnp.asarray(h)
    a = hub.hub_pool_matmul(hp, hj, dtype=jnp.float32, gather_impl="xla")
    b = hub.hub_pool_matmul(hp, hj, dtype=jnp.float32, gather_impl="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)
    ga = jax.grad(lambda x: jnp.sum(
        hub.hub_pool_matmul(hp, x, jnp.float32, "xla") ** 2))(hj)
    gb = jax.grad(lambda x: jnp.sum(
        hub.hub_pool_matmul(hp, x, jnp.float32, "pallas") ** 2))(hj)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=2e-4, atol=2e-4)


def test_hub_pool_gradients_flow():
    n, d = 128, 8
    nbrs, w, h = _tables(n=n, k=5, d=d, seed=4)
    hp, _ = hub.build_hub_pool(nbrs, w, valid_limit=n, head=32, residual=3,
                               dtype=jnp.float32)

    def loss(hj):
        return jnp.sum(hub.hub_pool_matmul(hp, hj, dtype=jnp.float32) ** 2)

    g = jax.grad(loss)(jnp.asarray(h))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_hub_pool_device_build_keeps_slab_row_sharded():
    """Under a mesh the [N, H] slab must come out ROW-SHARDED, not
    replicated (GSPMD's default for the scatter output — probed: the full
    slab landed on every device), and match the unsharded build."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from movie_recommendation_engine_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((2, 4))
    rs = NamedSharding(mesh, P("model", None))
    rng = np.random.default_rng(11)
    n, k = 512, 16
    nbrs_np = rng.integers(0, n, (n, k)).astype(np.int32)
    w_np = rng.random((n, k)).astype(np.float32)
    nbrs = jax.device_put(jnp.asarray(nbrs_np), rs)
    w = jax.device_put(jnp.asarray(w_np), rs)
    hp, _ = hub.build_hub_pool_device(nbrs, w, valid_limit=n, head=64,
                                      residual=4, a_head_sharding=rs)
    assert hp.a_head.sharding.spec == P("model", None), hp.a_head.sharding
    for s in hp.a_head.addressable_shards:
        assert s.data.shape[0] == n // 4      # one row shard per device
    ref, _ = hub.build_hub_pool_device(jnp.asarray(nbrs_np),
                                       jnp.asarray(w_np), valid_limit=n,
                                       head=64, residual=4)
    np.testing.assert_allclose(
        np.asarray(hp.a_head, dtype=np.float32),
        np.asarray(ref.a_head, dtype=np.float32), atol=1e-6)


def test_hub_pool_batch_apply_equals_full_rows():
    """hub_pool_matmul_batch is exactly rows of hub_pool_matmul (row
    independence of A), for both gather impls."""
    n, d = 256, 16
    nbrs, w, h = _tables(n=n, k=7, d=d, seed=5)
    hp, _ = hub.build_hub_pool(nbrs, w, valid_limit=n, head=32, residual=3,
                               dtype=jnp.float32)
    hj = jnp.asarray(h)
    batch = jnp.asarray([0, 3, 7, 255, 128, 3], jnp.int32)  # dup + ends
    full = np.asarray(hub.hub_pool_matmul(hp, hj, dtype=jnp.float32))
    for gi in ("xla", "pallas"):
        got = np.asarray(hub.hub_pool_matmul_batch(
            hp, hj, batch, dtype=jnp.float32, gather_impl=gi))
        np.testing.assert_allclose(got, full[np.asarray(batch)],
                                   rtol=2e-5, atol=2e-5, err_msg=gi)


def test_trainer_hub_final_layer_matches_gather(tmp_path):
    """hub_pool_final_layer=True with an everything-covering hub reproduces
    the gather trainer (the batch hub apply is the final layer's only
    difference), and builds one HubPool per layer."""
    def train_once(pool_impl, final, ck):
        cfg = small_test_config()
        cfg.train.epochs = 2
        cfg.train.max_pairs_per_epoch = 128
        cfg.model.pool_impl = pool_impl
        cfg.model.hub_pool_head = 100_000   # cover everything: exact
        cfg.model.hub_pool_residual = 64
        cfg.model.hub_pool_final_layer = final
        cfg.model.dropout = 0.0
        cfg.train.compute_dtype = "float32"
        cfg.paths.checkpoint_dir = str(tmp_path / ck)
        data = dataset.load(cfg)
        tr = Trainer(cfg, data, MetricsLogger(stream=io.StringIO()))
        out = tr.fit()
        return tr, [h["loss"] for h in out["history"]], np.asarray(
            tr.movie_embeddings())

    _, losses_g, emb_g = train_once("gather", False, "ck_gatherf")
    tr, losses_h, emb_h = train_once("hub", True, "ck_hubf")
    assert len(tr.pool_mats) == tr.cfg.model.num_layers
    assert all(isinstance(pm, hub.HubPool) for pm in tr.pool_mats)
    np.testing.assert_allclose(losses_h, losses_g, rtol=5e-3)
    cos = (emb_h * emb_g).sum(axis=1)
    assert cos.min() > 0.995


def test_trainer_hub_matches_gather(tmp_path):
    """pool_impl=hub with head covering the whole corpus + full residual
    reproduces the gather trainer exactly up to f32 summation order."""
    def train_once(pool_impl, ck):
        cfg = small_test_config()
        cfg.train.epochs = 2
        cfg.train.max_pairs_per_epoch = 128
        cfg.model.pool_impl = pool_impl
        cfg.model.hub_pool_head = 100_000   # cover everything: exact
        cfg.model.hub_pool_residual = 64
        cfg.model.dropout = 0.0
        cfg.train.compute_dtype = "float32"
        cfg.paths.checkpoint_dir = str(tmp_path / ck)
        data = dataset.load(cfg)
        tr = Trainer(cfg, data, MetricsLogger(stream=io.StringIO()))
        out = tr.fit()
        return tr, [h["loss"] for h in out["history"]], np.asarray(
            tr.movie_embeddings())

    _, losses_g, emb_g = train_once("gather", "ck_gather")
    tr, losses_h, emb_h = train_once("hub", "ck_hub")
    assert tr.pool_mats and isinstance(tr.pool_mats[0], hub.HubPool)
    np.testing.assert_allclose(losses_h, losses_g, rtol=5e-3)
    cos = (emb_h * emb_g).sum(axis=1)
    assert cos.min() > 0.995


def test_auto_head_formula():
    """bench.py's roofline reads this helper — it IS the auto-sizing."""
    assert hub.auto_head(16_000) == 4096       # floor
    assert hub.auto_head(59_392) == 7424       # N/8
    assert hub.auto_head(131_072) == 16384     # cap
    # The cap is BYTE-denominated (32 KB/row): an f8 slab admits twice the
    # columns at the same HBM footprint — at 256k that is N/8 = 32768 where
    # bf16 caps at N/16 (the capacity lever behind pool_matrix_dtype=f8).
    assert hub.auto_head(262_144) == 16384
    assert hub.auto_head(262_144, jnp.float8_e4m3fn) == 32768
    assert hub.auto_head(59_392, jnp.float8_e4m3fn) == 7424  # uncapped: same
    _, stats = hub.build_hub_pool(*_tables(n=64, k=5, d=4)[:2],
                                  valid_limit=64, head=0, residual=2)
    assert stats["head_cols"] == min(hub.auto_head(64), 64)
    assert "a_bytes_built" in stats


def test_auto_hub_final_capacity_gate(tiny_data, tmp_path):
    """pool_impl=auto at the hub rung hubs the FINAL layer too when the
    slab set fits auto_hub_final_max_bytes (measured 59k/128k win), and
    keeps the exact final-layer gather when the budget or the knob says
    no (the 256k bf16 OOM regime)."""
    from movie_recommendation_engine_tpu.train.trainer import Trainer

    base_cfg, data = tiny_data

    def pool_mats_for(**over):
        cfg = base_cfg.override({
            "model.pool_impl": "auto",
            "model.dense_pool_max_rows": 16,
            "model.dense_pool_hybrid_max_rows": 16,
            "model.hub_pool_max_dropped_mass": 1.0,
            "paths.checkpoint_dir": str(tmp_path),
            **over,
        })
        tr = Trainer(cfg, data)
        tr.refresh_neighborhoods()
        return tr.pool_mats

    mats = pool_mats_for()
    assert len(mats) == 2 and all(isinstance(m, hub.HubPool) for m in mats)
    mats = pool_mats_for(**{"model.auto_hub_final_max_bytes": 0})
    assert len(mats) == 1
    mats = pool_mats_for(**{"model.auto_hub_final": False})
    assert len(mats) == 1
    # Explicit hub_pool_final_layer is independent of the auto knob.
    mats = pool_mats_for(**{"model.auto_hub_final": False,
                            "model.hub_pool_final_layer": True})
    assert len(mats) == 2


def test_resolve_pool_matrix_dtype_auto():
    """'auto' picks f8 exactly where the bf16 head cap binds (hub rung,
    auto head, n > 131072) — the measured 256k capacity lever — and bf16
    everywhere else."""
    r = hub.resolve_pool_matrix_dtype
    assert r("auto", 59_392, "hub") == jnp.bfloat16       # cap not binding
    assert r("auto", 131_072, "hub") == jnp.bfloat16      # boundary: equal
    assert r("auto", 262_144, "hub") == jnp.float8_e4m3fn
    assert r("auto", 262_144, "hub", head_cfg=16384) == jnp.bfloat16
    assert r("auto", 262_144, "dense") == jnp.bfloat16    # not the hub rung
    assert r("auto", 262_144, "block") == jnp.bfloat16
    assert r("bfloat16", 262_144, "hub") == jnp.bfloat16  # explicit wins
    assert r("float8_e4m3fn", 59_392, "hub") == jnp.float8_e4m3fn
    with pytest.raises(KeyError):
        r("float16", 1000, "hub")


def test_hub_dropped_mass_cap_dedicated_knob(tmp_path):
    """hub_pool_max_dropped_mass >= 0 overrides the block threshold for the
    hub fallback decision (default -1 inherits it)."""
    cfg = small_test_config()
    cfg.model.pool_impl = "hub"
    cfg.model.hub_pool_head = 1           # drops nearly everything
    cfg.model.hub_pool_residual = 0
    cfg.model.block_pool_max_dropped_mass = 0.01   # would reject
    cfg.model.hub_pool_max_dropped_mass = 1.0      # hub-specific: accept all
    cfg.paths.checkpoint_dir = str(tmp_path / "ck_hubknob")
    data = dataset.load(cfg)
    tr = Trainer(cfg, data, MetricsLogger(stream=io.StringIO()))
    tr.refresh_neighborhoods()
    assert tr.pool_mats and isinstance(tr.pool_mats[0], hub.HubPool)


def test_trainer_hub_fallback_chain(tmp_path):
    """auto/hub with an impossible mass budget: explicit hub falls back to
    gather (empty pool_mats); auto falls through hub -> block, and with the
    block budget also impossible, ends at gather."""
    cfg = small_test_config()
    cfg.model.pool_impl = "hub"
    cfg.model.hub_pool_head = 1
    cfg.model.hub_pool_residual = 0
    cfg.model.block_pool_max_dropped_mass = 0.01
    cfg.paths.checkpoint_dir = str(tmp_path / "ck_hubfb")
    data = dataset.load(cfg)
    tr = Trainer(cfg, data, MetricsLogger(stream=io.StringIO()))
    tr.refresh_neighborhoods()
    assert tr.pool_mats == ()

    # auto at >hybrid scale would try hub then block; force that path by
    # shrinking the auto thresholds below the corpus size.
    cfg2 = small_test_config()
    cfg2.model.pool_impl = "auto"
    cfg2.model.dense_pool_max_rows = 1
    cfg2.model.dense_pool_hybrid_max_rows = 1
    cfg2.model.hub_pool_head = 1
    cfg2.model.hub_pool_residual = 0
    cfg2.model.block_pool_block_size = 16
    cfg2.model.block_pool_max_blocks = 1
    cfg2.model.block_pool_max_dropped_mass = 0.0001
    cfg2.paths.checkpoint_dir = str(tmp_path / "ck_autofb")
    data2 = dataset.load(cfg2)
    log = io.StringIO()
    tr2 = Trainer(cfg2, data2, MetricsLogger(stream=log))
    tr2.refresh_neighborhoods()
    assert tr2.pool_mats == ()
    text = log.getvalue()
    assert "hub_pool_fallback" in text
    assert "block_pool" in text  # the chain actually tried block next


def test_trainer_hub_residual_escalation(tmp_path):
    """When the hub drop exceeds the gate, the trainer doubles the residual
    ONCE before falling back (the 256k escape, RESULTS.md: auto head caps
    at N/16 and r8 drops 5.17%; r16 drops 0.42% and still beats gather).
    head=1 + residual=4 of K=8 drops the per-row tail (> 5% gate);
    residual 8 keeps every entry (~0 drop) — the escalated build must be
    adopted, not the fallback chain."""
    cfg = small_test_config()
    cfg.model.pool_impl = "hub"
    cfg.model.hub_pool_head = 1
    cfg.model.hub_pool_residual = 4
    cfg.paths.checkpoint_dir = str(tmp_path / "ck_hubesc")
    data = dataset.load(cfg)
    log = io.StringIO()
    tr = Trainer(cfg, data, MetricsLogger(stream=log))
    tr.refresh_neighborhoods()
    assert tr.pool_mats and isinstance(tr.pool_mats[0], hub.HubPool)
    assert tr.pool_mats[0].res_w.shape[1] == 8          # doubled residual
    text = log.getvalue()
    assert "hub_pool_residual_escalated" in text
    assert "hub_pool_fallback" not in text


def test_device_build_matches_host_build():
    """build_hub_pool_device (jitted scatter/top_k) must produce the same
    factorization as the numpy builder: same stats and the same pooled
    OUTPUT (tie-resolution in the head/residual selections may differ, but
    with distinct random weights the kept entry sets coincide)."""
    n, k, d = 400, 9, 12
    nbrs, w, h = _tables(n=n, k=k, d=d, seed=7)
    for head, res in ((64, 3), (0, 8), (n, k)):
        hp_h, st_h = hub.build_hub_pool(nbrs, w, valid_limit=n, head=head,
                                        residual=res, dtype=jnp.float32)
        hp_d, st_d = hub.build_hub_pool_device(
            jnp.asarray(nbrs), jnp.asarray(w), valid_limit=n, head=head,
            residual=res, dtype=jnp.float32)
        assert st_d["head_cols"] == st_h["head_cols"]
        assert st_d["residual_per_row"] == st_h["residual_per_row"]
        assert st_d["dropped_mass"] == pytest.approx(st_h["dropped_mass"],
                                                     abs=1e-5)
        assert st_d["head_mass"] == pytest.approx(st_h["head_mass"], abs=1e-5)
        out_h = np.asarray(hub.hub_pool_matmul(hp_h, jnp.asarray(h),
                                               dtype=jnp.float32))
        out_d = np.asarray(hub.hub_pool_matmul(hp_d, jnp.asarray(h),
                                               dtype=jnp.float32))
        np.testing.assert_allclose(out_d, out_h, rtol=2e-5, atol=2e-5,
                                   err_msg=f"head={head} residual={res}")


def test_device_build_zero_residual_delegates():
    n = 120
    nbrs, w, _ = _tables(n=n, k=5, seed=9)
    hp, st = hub.build_hub_pool_device(jnp.asarray(nbrs), jnp.asarray(w),
                                       valid_limit=n, head=32, residual=0,
                                       dtype=jnp.float32)
    assert np.asarray(hp.res_w).sum() == 0.0
    assert st["head_cols"] == 32
