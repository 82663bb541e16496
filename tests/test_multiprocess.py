"""True multi-process (2 x 4-virtual-device) jax.distributed test.

The virtual-mesh tests (conftest's 8-device single process) prove the SPMD
programs; this proves the MULTI-HOST runtime path: jax.distributed init over
a local coordinator, gloo CPU collectives, cross-process gradient psum, and
the sharded-retrieval all-gather — the layers a real pod exercises over DCN
(SURVEY.md §2b obligation; VERDICT r1 missing #4)."""

import json
import os
import socket
import subprocess
import sys
import time

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_epoch_and_retrieval():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    # Run-unique nonce for the coordinator-gate file: a stale file from a
    # previous run (same port) must not satisfy the gating assertion.
    env["MP_GATE_NONCE"] = f"{port}.{os.getpid()}.{time.time_ns()}"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=360)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err[-2000:]}"
    # BOTH workers' verdicts: each validated the sharded run against its own
    # in-process reference, and the cross-process psum means their losses
    # must be bitwise-identical — a silently diverging rank 1 fails here.
    verdicts = []
    for rc, out, err in outs:
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        verdicts.append(json.loads(line))
    assert sorted(v["pid"] for v in verdicts) == [0, 1]
    for verdict in verdicts:
        assert verdict["process_count"] == 2
        assert verdict["global_devices"] == 8
        assert verdict["ok"], verdict
    assert verdicts[0]["sharded_losses"] == verdicts[1]["sharded_losses"], (
        "cross-process psum diverged between ranks", verdicts)


FIT_WORKER = os.path.join(os.path.dirname(__file__), "mp_fit_worker.py")


def _spawn_fit(pid, nproc, port, ckpt_dir, epochs, resume, env):
    return subprocess.Popen(
        [sys.executable, FIT_WORKER, str(pid), str(nproc), str(port),
         ckpt_dir, str(epochs), resume],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
    )


def test_trainer_fit_two_process_kill_and_resume(tmp_path):
    """The REAL Trainer.fit() across a process boundary (VERDICT r3 #3):

    1. Two ranks run fit() (data axis spans processes, tables row-sharded).
       Once the coordinator's checkpoint lands, rank 1 is SIGKILLed — the
       survivor must heartbeat-abort (exit nonzero), not hang.
    2. A fresh 2-process cluster resumes from the killed run's checkpoint
       and trains 2 more epochs. Both ranks must report identical per-epoch
       losses AND identical digests of every host-side nondeterminism
       source (_epoch_pairs selection, neighborhood tables, RNG key) — the
       trainer.py determinism comment, now a tested invariant. Loss
       equality alone wouldn't prove it: the loss is a collective result,
       identical even if ranks fed diverged batch shards.
    """
    ckpt_dir = str(tmp_path / "ck")
    os.makedirs(ckpt_dir)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count

    # ---- phase 1: run + kill one rank -------------------------------------
    port = _free_port()
    procs = [_spawn_fit(pid, 2, port, ckpt_dir, 40, "-", env)
             for pid in range(2)]
    last_npz = os.path.join(ckpt_dir, "last_model.npz")
    last_meta = os.path.join(ckpt_dir, "last_model.meta.json")
    deadline = time.time() + 150
    while time.time() < deadline:
        if os.path.exists(last_npz) and os.path.exists(last_meta):
            break
        if any(p.poll() is not None for p in procs):
            break
        time.sleep(0.5)
    for p in procs:
        assert p.poll() is None, (
            "worker died before the first checkpoint",
            p.communicate()[1][-2000:],
        )
    assert os.path.exists(last_npz), "no checkpoint within 150s"
    procs[1].kill()
    procs[1].communicate()
    try:
        out0, err0 = procs[0].communicate(timeout=240)
    except subprocess.TimeoutExpired:
        procs[0].kill()
        raise AssertionError(
            "survivor hung >240s after peer death (heartbeat abort missing)")
    assert procs[0].returncode != 0, (
        "survivor exited 0 — it cannot have finished 40 epochs; expected a "
        "heartbeat abort", out0)

    from movie_recommendation_engine_tpu.core import checkpoint as ckpt

    e0 = int(ckpt.load_meta(os.path.join(ckpt_dir, "last_model"))["epoch"])
    assert e0 >= 1

    # ---- phase 2: fresh cluster, survivor-style --resume ------------------
    port = _free_port()
    resume = os.path.join(ckpt_dir, "last_model")
    procs = [_spawn_fit(pid, 2, port, ckpt_dir, e0 + 2, resume, env)
             for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=360)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for rc, out, err in outs:
        assert rc == 0, f"resume worker rc={rc}\nstderr:{err[-2000:]}"
    verdicts = [json.loads([l for l in out.splitlines()
                            if l.startswith("{\"pid\"")][-1])
                for _, out, _ in outs]
    assert sorted(v["pid"] for v in verdicts) == [0, 1]
    for v in verdicts:
        assert v["ok"], v
        assert v["start_epoch"] == e0
        assert v["ckpt_epoch"] == e0 + 2
        assert v["has_val"]
    a, b = verdicts
    assert a["losses"] == b["losses"], (a, b)
    assert a["pair_digests"] == b["pair_digests"], (a, b)
    assert a["tbl_digest"] == b["tbl_digest"], (a, b)
    assert a["rng_digest"] == b["rng_digest"], (a, b)


def test_distributed_init_is_idempotent(monkeypatch):
    """The CLI calls distributed_init on every entry and main(argv) may run
    several commands in one process — initialize() must fire at most once."""
    from movie_recommendation_engine_tpu.parallel import mesh as mesh_mod

    calls = []
    monkeypatch.setattr(mesh_mod, "_DISTRIBUTED_INITIALIZED", False)
    monkeypatch.setattr(mesh_mod.jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:9999")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    monkeypatch.setenv("JAX_PROCESS_ID", "0")
    assert mesh_mod.distributed_init() is True
    assert mesh_mod.distributed_init() is True
    assert len(calls) == 1

    # Initialized elsewhere first: the "only be called once" RuntimeError is
    # treated as already-joined, not a crash.
    monkeypatch.setattr(mesh_mod, "_DISTRIBUTED_INITIALIZED", False)

    def boom(**kw):
        raise RuntimeError("jax.distributed.initialize should only be called once.")

    monkeypatch.setattr(mesh_mod.jax.distributed, "initialize", boom)
    assert mesh_mod.distributed_init() is True
