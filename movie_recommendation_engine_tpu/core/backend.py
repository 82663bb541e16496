"""Backend capability detection.

The production question is never "what does ``jax.default_backend()``
return" — it is "can this process compile Pallas/Mosaic kernels for the
device it holds". On a directly-attached TPU it can; through the axon
relay/tunnel (remote-compile) it cannot (Mosaic programs hang the remote
compiler or come back HTTP 413 — CLAUDE.md).

Detection subtlety (measured round 2): the axon PJRT plugin registers the
platform as ``"axon"`` but canonicalizes it to ``"tpu"`` for MLIR lowering,
so ``jax.default_backend()`` reports ``"tpu"`` — string-comparing it is how
round 1's gating silently enabled the Pallas Hamming kernel through the
tunnel and wedged every full-corpus LSH search. The reliable signal is the
platform *selection* (``jax_platforms`` config / ``JAX_PLATFORMS`` env),
which this environment pins to ``"axon"``.
"""

from __future__ import annotations

import os

import jax


def is_tunnel_backend() -> bool:
    """True when the device is reached through the axon relay (remote
    compile; Mosaic kernels unavailable)."""
    try:
        platforms = jax.config.jax_platforms or ""
    except AttributeError:  # very old jax config surface
        platforms = ""
    env = os.environ.get("JAX_PLATFORMS", "")
    return "axon" in platforms or ("axon" in env and not platforms)


def pallas_supported() -> bool:
    """True when Pallas/Mosaic kernels can compile for the default backend:
    a real locally-attached TPU. (CPU runs them in interpret mode only —
    callers that accept interpret must check the backend themselves.)

    The tunnel check comes FIRST: ``jax.default_backend()`` initializes the
    backend registry, and through the relay that means claiming the shared
    chip — answering "no" must never cost a device claim."""
    return not is_tunnel_backend() and jax.default_backend() == "tpu"
