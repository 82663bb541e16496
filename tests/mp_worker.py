"""Multi-process worker for tests/test_multiprocess.py.

Each of N processes hosts 4 virtual CPU devices; together they form one
(data=N, model=4) jax.distributed cluster (gloo CPU collectives). The worker
runs a 4-step sharded training epoch (make_sharded_train_step) plus sharded
exact retrieval (sharded_similarity_topk), verifies both against local
single-host references computed independently in-process, and process 0
prints a JSON verdict line.

Usage: python tests/mp_worker.py <process_id> <num_processes> <port>
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")  # env alone is ignored (axon
    # sitecustomize); see CLAUDE.md.
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from movie_recommendation_engine_tpu.parallel.mesh import (
        distributed_init, make_mesh,
    )

    assert distributed_init(coordinator=f"127.0.0.1:{port}",
                            num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    devices = jax.devices()
    assert len(devices) == 4 * nproc

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from movie_recommendation_engine_tpu.models import losses, pinsage
    from movie_recommendation_engine_tpu.parallel.sharding import (
        ShardedStepConfig, make_sharded_train_step,
    )
    from movie_recommendation_engine_tpu.retrieval.sharded import (
        sharded_similarity_topk,
    )
    from movie_recommendation_engine_tpu.train import optim

    # data axis spans processes (row p = process p's local devices), model
    # axis stays host-local — gradient psum crosses the "DCN" (here: gloo),
    # table gathers stay "on-chip".
    mesh = make_mesh((nproc, 4), devices=devices)

    def gput(x, spec):
        sh = NamedSharding(mesh, spec)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    # ---- tiny deterministic workload (identical on every process) ---------
    rng = np.random.default_rng(0)
    n, f, hdim, e, k = 64, 16, 32, 16, 4
    params = pinsage.init_params(jax.random.PRNGKey(0), f, hdim, e, 2)
    opt_state = optim.adam_init(params)
    x = rng.standard_normal((n, f)).astype(np.float32)
    nbrs = [rng.integers(0, n, (n, k)).astype(np.int32) for _ in range(2)]
    ws = [rng.random((n, k)).astype(np.float32) for _ in range(2)]

    scfg = ShardedStepConfig(loss="max_margin", num_hard=2, epoch=1,
                             valid_limit=n, dtype=jnp.float32)
    compile_step = make_sharded_train_step(mesh, scfg)
    step = compile_step(params, opt_state, tuple(nbrs), tuple(ws), ())

    steps = []
    b = 4 * nproc
    for s in range(4):
        srng = np.random.default_rng(100 + s)
        steps.append((
            srng.integers(0, n, b).astype(np.int32),
            srng.integers(0, n, b).astype(np.int32),
            srng.choice(n, 8, replace=False).astype(np.int32),
            srng.integers(0, n, (b, 2)).astype(np.int32),
        ))

    # ---- sharded 4-step epoch ---------------------------------------------
    g_params = jax.tree_util.tree_map(lambda a: gput(a, P()), params)
    g_opt = jax.tree_util.tree_map(lambda a: gput(a, P()), opt_state)
    g_x = gput(x, P("model", None))
    g_nbrs = tuple(gput(a, P("model", None)) for a in nbrs)
    g_ws = tuple(gput(a, P("model", None)) for a in ws)
    sharded_losses = []
    for q, p, rn, hn in steps:
        g_params, g_opt, loss = step(
            g_params, g_opt, g_x, g_nbrs, g_ws, (),
            gput(q, P("data")), gput(p, P("data")), gput(rn, P()),
            gput(hn, P("data", None)), np.float32(1e-2),
        )
        sharded_losses.append(float(loss))

    # ---- local (unsharded) reference: same math, same inputs ---------------
    def local_loss(params, q, p, rn, hn):
        all_nodes = jnp.concatenate([q, p, rn, hn.reshape(-1)])
        emb = pinsage.pooled_forward_batch(
            params, jnp.asarray(x), [jnp.asarray(a) for a in nbrs],
            [jnp.asarray(a) for a in ws], all_nodes,
            valid_limit=n, dtype=jnp.float32,
        )
        bb = q.shape[0]
        q_e, p_e = emb[:bb], emb[bb:2 * bb]
        r_e = emb[2 * bb:2 * bb + 8]
        return losses.shared_pool_max_margin_loss(q_e, p_e, r_e, scfg.margin)

    l_params, l_opt = params, opt_state
    local_losses = []
    grad_fn = jax.jit(jax.value_and_grad(local_loss), static_argnums=())
    for q, p, rn, hn in steps:
        lv, grads = grad_fn(l_params, jnp.asarray(q), jnp.asarray(p),
                            jnp.asarray(rn), jnp.asarray(hn))
        l_params, l_opt = optim.adam_update(grads, l_opt, l_params,
                                            jnp.float32(1e-2))
        local_losses.append(float(lv))

    loss_err = max(abs(a - c) for a, c in zip(sharded_losses, local_losses))

    # ---- sharded retrieval over the trained embeddings ----------------------
    emb_fn = jax.jit(lambda pr: pinsage.pooled_forward(
        pr, jnp.asarray(x), [jnp.asarray(a) for a in nbrs],
        [jnp.asarray(a) for a in ws], valid_limit=n, dtype=jnp.float32))
    emb_local = np.asarray(emb_fn(l_params))
    queries = emb_local[:5]
    g_emb = gput(emb_local, P("model", None))
    scores, idx = sharded_similarity_topk(mesh, g_emb, gput(queries, P()),
                                          k=5, valid_rows=n)
    idx = np.asarray(idx)
    exact = np.argsort(-(queries @ emb_local.T), axis=1)[:, :5]
    retrieval_match = bool((idx == exact).all())

    # ---- multi-host failure-handling surface: barrier + coordinator gating -
    from movie_recommendation_engine_tpu.parallel import mesh as mesh_mod

    assert mesh_mod.is_coordinator() == (jax.process_index() == 0)
    mesh_mod.barrier("mp_worker_test")          # must not deadlock
    # Coordinator-gated shared-FS write: both ranks call, one file appears.
    import tempfile

    shared = os.path.join(tempfile.gettempdir(), f"mp_ckpt_gate_{port}")
    # Run-unique content: a stale file from a previous run must not satisfy
    # the check (it would make the write-ordering assertion vacuous).
    nonce = f"coordinator:{os.environ.get('MP_GATE_NONCE', port)}"
    if mesh_mod.is_coordinator():
        with open(shared, "w") as f:
            f.write(nonce)
    mesh_mod.barrier("mp_ckpt_gate")
    try:
        with open(shared) as f:                 # visible on every rank
            barrier_gate_ok = f.read() == nonce
    except FileNotFoundError:
        barrier_gate_ok = False
    mesh_mod.barrier("mp_ckpt_gate_read")       # both ranks read before...
    if mesh_mod.is_coordinator():
        os.unlink(shared)                       # ...the coordinator cleans up

    # EVERY process prints its verdict (not just rank 0): the test parses
    # all of them and asserts the cross-process psum produced identical
    # losses on both sides — a silently diverging rank 1 must fail the test.
    print(json.dumps({
        "pid": pid,
        "process_count": jax.process_count(),
        "global_devices": len(devices),
        "mesh": {k: int(v) for k, v in mesh.shape.items()},
        "sharded_losses": sharded_losses,
        "loss_err_vs_local": loss_err,
        "retrieval_match": retrieval_match,
        "barrier_gate_ok": barrier_gate_ok,
        "ok": bool(loss_err < 1e-4 and retrieval_match and barrier_gate_ok),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
