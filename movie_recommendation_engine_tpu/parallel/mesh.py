"""Device mesh & distributed runtime.

Entirely new relative to the reference, which is single-device
(``run.py:87`` cuda-else-cpu; SURVEY.md §2b documents the absence of any
parallelism). Axes:

- ``data``  — batch (data-parallel); gradients are reduced by XLA-inserted
  psum over ICI.
- ``model`` — row-sharding for node feature / embedding / neighborhood
  tables (the "graph side" scaling axis; SURVEY.md §5: the TPU analog of
  long-context here is #nodes).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DISTRIBUTED_INITIALIZED = False


def distributed_init(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    init_timeout_s: int | None = None,
) -> bool:
    """Multi-host init. Must run BEFORE the first backend use (calling any
    device-touching jax API first would bind a single-process backend).

    Auto-configures from JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID when args are omitted; returns False (no-op) when no
    coordinator is configured — the single-host path. The CLI calls this on
    every entry (cli/main.py), so a pod launch is just:

        JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=N \\
        JAX_PROCESS_ID=i python -m movie_recommendation_engine_tpu train ...

    Failure handling: ``init_timeout_s`` (env JAX_INIT_TIMEOUT_S, default
    300) bounds the coordinator rendezvous so a missing/crashed host fails
    the launch with a clear error instead of hanging the pod forever; after
    init, the JAX distributed runtime's own heartbeat service detects a
    peer death mid-run and aborts the survivors (which then resume from the
    last checkpoint — fit(resume_from=...) / the CLI --resume flag)."""
    global _DISTRIBUTED_INITIALIZED
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coordinator:
        return False
    if _DISTRIBUTED_INITIALIZED:
        # initialize() may be called at most once per process; the CLI calls
        # this on every entry, and main(argv) is a public programmatic API
        # that may run several commands in one process.
        return True
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None
    if init_timeout_s is None:
        env = os.environ.get("JAX_INIT_TIMEOUT_S")
        init_timeout_s = int(env) if env else 300
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
            initialization_timeout=init_timeout_s,
        )
    except RuntimeError as e:
        # Initialized outside this helper (e.g. by the embedding
        # application) — treat as already-joined rather than crashing.
        if "once" not in str(e):
            raise
    _DISTRIBUTED_INITIALIZED = True
    return True


def is_coordinator() -> bool:
    """True on the process that owns shared-filesystem writes (checkpoints,
    exports). Trivially true single-host."""
    return jax.process_index() == 0


def barrier(tag: str = "barrier") -> None:
    """Cross-host sync point: returns once EVERY process has reached it.
    No-op single-process. Used around shared-FS checkpoint writes so no
    process races ahead to read (or exit) before the coordinator's write
    lands; any dead peer turns this into a heartbeat-detected abort rather
    than a silent hang."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)


def make_mesh(
    shape: tuple[int, int] | None = None,
    axis_names: tuple[str, str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """(data, model) mesh. Default: all devices on the data axis.

    For multi-host slices, axes are laid out so the model axis stays within
    a host's local devices when possible (table gathers ride ICI, gradient
    psum crosses DCN only once per step)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """First dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """First dim over the model axis (feature/embedding/neighbor tables)."""
    return NamedSharding(mesh, P("model", None))


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0, value=0):
    """Pad an array so dim ``axis`` divides ``multiple`` (sharding needs
    evenly divisible global shapes)."""
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, constant_values=value), n
