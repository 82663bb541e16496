"""Pallas TPU kernels.

- ``hamming``: multi-table XOR+popcount Hamming distance (LSH scoring core).
- ``pool``: fused DMA-gather importance pooling (gather-form complement to
  the dense-matrix MXU pooling in models/pinsage.py).

Kernels are compiled on real TPU backends and exercised in interpret mode in
tests; the tunnel-backed `axon` platform cannot remote-compile Pallas
(CLAUDE.md), so callers gate on the backend (see retrieval/lsh.py).
"""

from .hamming import hamming_distance, hamming_topk  # noqa: F401
from .pool import gather_pool  # noqa: F401
