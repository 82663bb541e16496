"""Backend capability detection.

The production question is never "what does ``jax.default_backend()``
return" — it is "can this process compile Pallas/Mosaic kernels for the
device it holds". On a directly-attached TPU it can. Through the axon
relay/tunnel the answer CHANGED in round 3: remote Mosaic compilation now
works (the rewritten ``ops/pallas/pool.gather_pool`` compiled and ran
correctly on the chip — RESULTS.md "Pallas on real silicon"), but compile
latency is erratic (55 s to 21 min observed) and early rounds saw hangs/
HTTP 413, so tunnel Pallas stays OPT-IN via ``MRE_TUNNEL_PALLAS=1`` rather
than default.

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


def pallas_allowed() -> bool:
    """True when a *requested* Pallas path may route to the kernel here:
    any non-tunnel backend (a local TPU compiles Mosaic; CPU runs interpret
    mode for tests), or the tunnel with the explicit ``MRE_TUNNEL_PALLAS=1``
    opt-in. This is the gate for the math sites (hub residual gather,
    importance_pool) — unlike ``pallas_supported`` it never initializes the
    backend registry, so it is safe inside traced/forward code paths."""
    return (not is_tunnel_backend()
            or os.environ.get("MRE_TUNNEL_PALLAS", "0") == "1")


def pallas_supported() -> bool:
    """True when Pallas/Mosaic kernels can compile for the default backend:
    a real locally-attached TPU, or the tunnel with the explicit
    ``MRE_TUNNEL_PALLAS=1`` opt-in (kernels proven correct there in round 3;
    opt-in because remote compiles can take many minutes and a killed
    compile wedges the shared chip claim). CPU runs them in interpret mode
    only — callers that accept interpret must check the backend themselves.

    The tunnel check comes FIRST: ``jax.default_backend()`` initializes the
    backend registry, and through the relay that means claiming the shared
    chip — answering "no" must never cost a device claim."""
    if is_tunnel_backend() and os.environ.get("MRE_TUNNEL_PALLAS", "0") != "1":
        return False
    return jax.default_backend() == "tpu"
