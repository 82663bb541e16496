"""Pallas TPU kernels.

- ``hamming``: multi-table XOR+popcount Hamming distance (LSH scoring core).
- ``pool``: fused DMA-gather importance pooling (gather-form complement to
  the dense-matrix MXU pooling in models/pinsage.py).

Kernels are compiled on real TPU backends and exercised in interpret mode in
tests. Both kernels are proven correct on real silicon (round 3 —
RESULTS.md "Pallas on real silicon"); through the tunnel-backed `axon`
platform they compile too, but stay behind the ``MRE_TUNNEL_PALLAS=1``
opt-in (erratic remote-compile latency), so callers gate on
``core.backend.pallas_supported()`` (see retrieval/lsh.py).
"""

from .hamming import hamming_distance, hamming_topk  # noqa: F401
from .pool import gather_pool  # noqa: F401
