"""LSH retrieval: random-hyperplane signatures + batched Hamming top-k.

Replaces FAISS ``IndexLSH(dim, 256, 16)`` (reference
utils/nearest_neighbors.py:7-68; defaults config.py:50-51). Design:

- ``num_tables`` independent random-hyperplane projections of ``num_bits``
  each; item/query signatures are sign bits packed into uint32 lanes
  ([N, T, W] with W = num_bits/32).
- Search scores each item by its **minimum** Hamming distance across tables
  (the batched analogue of classic multi-table LSH where a candidate matching
  any table is retrieved), computed with XOR + ``lax.population_count`` —
  integer VPU ops, no MXU involvement — then a single top-k.

The whole search is one jitted program over signatures resident in HBM;
nothing touches the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _pack_bits(signs: jax.Array) -> jax.Array:
    """[..., B] bool -> [..., B/32] uint32 (B must be a multiple of 32)."""
    *lead, b = signs.shape
    w = b // 32
    x = signs.reshape(*lead, w, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(x << shifts, axis=-1, dtype=jnp.uint32)


class LSHIndex:
    """build(embeddings) / search(queries, k) mirroring the reference class
    (utils/nearest_neighbors.py:7-68)."""

    def __init__(self, dim: int, num_bits: int = 256, num_tables: int = 16,
                 seed: int = 0, use_pallas: bool | None = None,
                 hamming_impl: str | None = None, rerank: int = 0):
        if num_bits % 32:
            raise ValueError("num_bits must be a multiple of 32")
        self.dim = dim
        self.num_bits = num_bits
        self.num_tables = num_tables
        # rerank > 0: take that many min-Hamming candidates and re-score them
        # with exact dot products against the stored embeddings (production
        # shortlist-then-rerank; measured at 59k items the plain Hamming
        # ranking only reaches recall@10 ~0.38 — RESULTS.md). 0 = off,
        # matching FAISS IndexLSH semantics (reference
        # utils/nearest_neighbors.py:47-55).
        self.rerank = int(rerank)
        key = jax.random.PRNGKey(seed)
        # [T, D, B] hyperplanes.
        self.planes = jax.random.normal(
            key, (num_tables, dim, num_bits), dtype=jnp.float32
        )
        if use_pallas is None:
            import os

            if os.environ.get("MRE_USE_PALLAS"):
                use_pallas = os.environ["MRE_USE_PALLAS"] == "1"
            else:
                # Default on for real locally-attached TPU backends only.
                # NOTE: the axon tunnel canonicalizes its platform to "tpu",
                # so default_backend() alone is NOT a safe signal — it
                # enabled this kernel through the tunnel in round 2 and
                # wedged every full-corpus search (core/backend.py).
                from ..core.backend import pallas_supported

                use_pallas = pallas_supported()
        self.use_pallas = use_pallas
        # Hamming scoring form: "popcount" = packed-bit XOR +
        # lax.population_count (lowest bandwidth; VPU integer ops);
        # "matmul" = +-1 signatures on the MXU via ham = (B - q.s)/2 —
        # numerically exact (integer dot products <= 256 accumulate in f32)
        # and the only form whose program the axon tunnel's remote compiler
        # accepts at full-corpus scale (the popcount scan hangs it).
        if hamming_impl is None:
            import os

            hamming_impl = os.environ.get("MRE_LSH_IMPL")
            if hamming_impl is None:
                from ..core.backend import is_tunnel_backend

                hamming_impl = "matmul" if is_tunnel_backend() else "popcount"
        if hamming_impl not in ("popcount", "matmul"):
            raise ValueError(f"unknown hamming_impl {hamming_impl!r}")
        self.hamming_impl = hamming_impl
        self._sigs: jax.Array | None = None
        self._sigs_pm: jax.Array | None = None
        self._emb: jax.Array | None = None
        self._sqnorm: jax.Array | None = None

    @property
    def ntotal(self) -> int:
        return 0 if self._sigs is None else int(self._sigs.shape[0])

    def _signatures(self, x: jax.Array) -> jax.Array:
        """[N, D] -> packed [N, T, W] uint32.

        Chunked over rows: one [C, D] x [D, T*B] matmul per chunk, signs
        packed immediately — the full [N, T, B] f32 projection (1 GB at
        ML-25M scale) never materializes."""
        t, d, b = self.planes.shape
        planes_flat = self.planes.transpose(1, 0, 2).reshape(d, t * b)
        n = x.shape[0]
        chunk = 4096
        pad = (-n) % chunk
        xp = jnp.pad(x, ((0, pad), (0, 0)))

        def body(_, xc):
            proj = jnp.dot(xc, planes_flat, preferred_element_type=jnp.float32)
            sig = _pack_bits((proj >= 0).reshape(xc.shape[0], t, b))
            return _, sig

        _, sigs = jax.lax.scan(body, None, xp.reshape(-1, chunk, d))
        return sigs.reshape(-1, t, b // 32)[:n]

    def build(self, embeddings) -> None:
        x = jnp.asarray(embeddings, dtype=jnp.float32)
        self._sigs = self._signatures(x)
        if self.hamming_impl == "matmul":
            self._sigs_pm = _unpack_pm(self._sigs)
        # Keep the corpus + squared norms resident unconditionally ([N, D]
        # f32 — 30 MB at ML-25M scale, dwarfed by the +-1 signatures) so
        # ``rerank`` can be toggled after build, like ``hamming_impl``.
        self._emb = x
        self._sqnorm = jnp.sum(x * x, axis=1)

    def search(self, queries, k: int = 10):
        """Returns (distances [Q, k], indices [Q, k]), ascending. Without
        rerank, distances are min-table Hamming distances (FAISS-style);
        with rerank they are squared L2 distances of the re-scored
        shortlist (exactly ExactIndex's convention)."""
        q = jnp.asarray(queries, dtype=jnp.float32)
        c = 0 if self.rerank <= 0 else min(max(self.rerank, k), self.ntotal)
        if self.hamming_impl == "matmul":
            if self._sigs_pm is None:  # built before impl switch
                self._sigs_pm = _unpack_pm(self._sigs)
            # ONE dispatch end-to-end: query bits never need packing for the
            # matmul form, so projection -> sign(+-1) -> per-table dots ->
            # top_k fuse into a single program. Each extra dispatch costs a
            # full relay round-trip on the tunnel backend (~50 ms); the
            # 3-program form measured 667 ms serve p50 vs exact's 53 ms.
            if c > 0:
                return _lsh_search_matmul_rerank(
                    q, self.planes, self._sigs_pm, self._emb, self._sqnorm,
                    c, k)
            return _lsh_search_matmul(q, self.planes, self._sigs_pm, k)
        qsig = self._signatures(q)
        if self.use_pallas:
            from ..ops.pallas.hamming import hamming_topk

            t, w = self.num_tables, self.num_bits // 32
            d, i = hamming_topk(
                qsig.reshape(qsig.shape[0], t * w),
                self._sigs.reshape(self._sigs.shape[0], t * w),
                max(c, k), num_tables=t, words=w,
            )
        else:
            d, i = _hamming_topk(qsig, self._sigs, max(c, k))
        if c > 0:
            return _exact_rerank(q, self._emb, self._sqnorm, i, k)
        return d, i


@jax.jit
def _unpack_pm(sigs: jax.Array) -> jax.Array:
    """Packed [N, T, W] uint32 -> +-1 bf16 [T, N, W*32] (bit 1 -> +1).

    Table-major layout so each scan step of the search slices one
    contiguous [N, B] operand (no per-search transpose of the corpus)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (sigs[..., None] >> shifts) & jnp.uint32(1)          # [N, T, W, 32]
    pm = bits.astype(jnp.bfloat16) * 2.0 - 1.0
    n, t, w, _ = pm.shape
    return jnp.moveaxis(pm.reshape(n, t, w * 32), 1, 0)


def _min_ham_topk(best_ip: jax.Array, num_bits: int, k: int):
    """Shared epilogue: best (max) inner product over tables -> min Hamming
    distance -> top-k. For +-1 vectors of length B, ham = (B - ip) / 2."""
    dist = (num_bits - best_ip) * 0.5
    neg, idx = jax.lax.top_k(-dist, k)
    return (-neg).astype(jnp.int32), idx


@partial(jax.jit, static_argnames=("k",))
def _lsh_search_matmul(q: jax.Array, planes: jax.Array, sigs_pm: jax.Array,
                       k: int):
    """Fused matmul-impl search: project -> sign -> per-table MXU Hamming ->
    top_k in ONE program. Same ``proj >= 0`` sign convention as
    ``_signatures``; queries skip bit-packing entirely. (Equality with the
    popcount form holds in tests; a projection within f32 rounding noise of
    exactly 0.0 could in principle sign differently under a different
    contraction order, so the guarantee is convention-level, not claimed
    bit-level across backends.)"""
    return _min_ham_topk(_best_table_ip(q, planes, sigs_pm),
                         sigs_pm.shape[2], k)


def _best_table_ip(q: jax.Array, planes: jax.Array,
                   sigs_pm: jax.Array) -> jax.Array:
    """[Q, N] best (max) ±1 inner product across tables: project each query
    onto every table's hyperplanes, sign to ±1, one MXU dot per table
    (unrolled — T is small and static), running max. Shared by the plain and
    rerank fused searches so the sign convention can never diverge."""
    t = sigs_pm.shape[0]
    best = None
    for ti in range(t):
        proj = jnp.dot(q, planes[ti], preferred_element_type=jnp.float32)
        qs = jnp.where(proj >= 0, 1.0, -1.0).astype(sigs_pm.dtype)  # [Q, B]
        ip = jnp.dot(qs, sigs_pm[ti].T, preferred_element_type=jnp.float32)
        best = ip if best is None else jnp.maximum(best, ip)
    return best


def _rerank_epilogue(q: jax.Array, emb: jax.Array, sqnorm: jax.Array,
                     cand: jax.Array, k: int):
    """Exact re-scoring of a [Q, C] candidate shortlist: gather the candidate
    embedding rows and take top-k by squared L2 distance — the identical
    ||q||^2 + ||x||^2 - 2 q.x expansion ExactIndex uses, so reranked results
    agree with exact search even on non-unit-norm corpora. The gather is tiny
    ([Q, C, D] — Q*C rows vs the corpus's N), so the whole rerank costs far
    less than one extra table's Hamming matmul."""
    ce = jnp.take(emb, cand, axis=0)                      # [Q, C, D]
    ip = jnp.einsum("qd,qcd->qc", q, ce,
                    preferred_element_type=jnp.float32)    # [Q, C]
    dist = (jnp.sum(q * q, axis=1, keepdims=True)
            + jnp.take(sqnorm, cand) - 2.0 * ip)
    neg, j = jax.lax.top_k(-dist, k)
    return -neg, jnp.take_along_axis(cand, j, axis=1)


@partial(jax.jit, static_argnames=("c", "k"))
def _lsh_search_matmul_rerank(q: jax.Array, planes: jax.Array,
                              sigs_pm: jax.Array, emb: jax.Array,
                              sqnorm: jax.Array, c: int, k: int):
    """Fused shortlist-then-rerank, still ONE program: project -> sign ->
    per-table MXU Hamming -> top-c shortlist -> exact L2 re-rank -> top-k."""
    best = _best_table_ip(q, planes, sigs_pm)
    _, cand = jax.lax.top_k(best, c)   # max inner product == min Hamming
    return _rerank_epilogue(q, emb, sqnorm, cand, k)


@partial(jax.jit, static_argnames=("k",))
def _exact_rerank(q: jax.Array, emb: jax.Array, sqnorm: jax.Array,
                  cand: jax.Array, k: int):
    """Standalone rerank program for the popcount/Pallas paths (their
    shortlist comes out of a separate Hamming program)."""
    return _rerank_epilogue(q, emb, sqnorm, cand, k)


@partial(jax.jit, static_argnames=("k",))
def _hamming_topk_matmul(qsig_pm: jax.Array, sigs_pm: jax.Array, k: int):
    """MXU Hamming: for +-1 vectors of length B, ham = (B - q.s) / 2.

    An unrolled loop over tables (T is static) of one [Q, B] x [B, N] matmul
    each with a running max — every op structurally the same program as
    exact search (one dot + top_k), which the axon tunnel's remote compiler
    handles at full-corpus scale; chosen as the lowest-risk tunnel program.
    (The round-2 full-corpus wedges first blamed on the einsum/scan forms
    were actually the mis-gated Pallas path — core/backend.py; those forms
    were never exercised through the tunnel. scripts/lsh59k_probe.py
    isolates the formulations.) It also avoids the einsum form's [Q, N, T]
    f32 intermediate (966 MB at 59k). Integer dot products (|ip| <= B)
    accumulate exactly in f32, so results are bit-identical to the popcount
    form."""
    t, n, b = sigs_pm.shape
    best = None
    for ti in range(t):                                         # [T, Q, B]
        ip = jnp.dot(qsig_pm[ti], sigs_pm[ti].T,
                     preferred_element_type=jnp.float32)        # [Q, N]
        best = ip if best is None else jnp.maximum(best, ip)
    return _min_ham_topk(best, b, k)


@partial(jax.jit, static_argnames=("k",))
def _hamming_topk(qsig: jax.Array, sigs: jax.Array, k: int):
    """qsig [Q, T, W], sigs [N, T, W] -> (min-table Hamming distance [Q, k],
    indices [Q, k]). Chunked over N to bound the [Q, C, T, W] XOR buffer."""
    qn, t, w = qsig.shape
    n = sigs.shape[0]
    # Chunk sized so the [Q, C, T, W] XOR buffer stays ~128M elements —
    # large enough that the scan is bandwidth- rather than overhead-bound.
    chunk = max(1, (1 << 27) // max(qn * t * w, 1))
    chunk = int(min(max(512, chunk), max(n, 512)))
    pad = (-n) % chunk
    sigs_p = jnp.pad(sigs, ((0, pad), (0, 0), (0, 0)))
    num_chunks = sigs_p.shape[0] // chunk

    def body(_, ci):
        block = jax.lax.dynamic_slice_in_dim(sigs_p, ci * chunk, chunk, axis=0)
        x = jnp.bitwise_xor(qsig[:, None], block[None])      # [Q, C, T, W]
        ham = jnp.sum(jax.lax.population_count(x), axis=-1)   # [Q, C, T]
        dist = jnp.min(ham, axis=-1).astype(jnp.int32)        # [Q, C]
        return _, dist

    _, dists = jax.lax.scan(body, None, jnp.arange(num_chunks))
    dists = jnp.moveaxis(dists, 0, 1).reshape(qn, -1)[:, :n]  # [Q, N]
    neg, idx = jax.lax.top_k(-dists, k)
    return -neg, idx
