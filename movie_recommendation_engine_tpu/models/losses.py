"""Training losses.

Pure-function ports of the reference's three losses (``model/loss.py``):
- max-margin ranking with max-over-negatives for [B, N, D] negatives
  (model/loss.py:6-64)
- batch-hard triplet with in-batch hardest negative (model/loss.py:66-113)
- curriculum combiner: base + hard_weight * hard_loss where
  hard_weight = min(epoch, max_epochs)/max_epochs * hard_negative_factor
  (model/loss.py:115-176)

Plus the reference's *shipped* simplified objective — negative mean cosine
similarity (train.py:75-78) — kept for strict parity runs of the reference
train loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def max_margin_loss(
    query: jax.Array,      # [B, D]
    positive: jax.Array,   # [B, D]
    negative: jax.Array,   # [B, D] or [B, N, D] or [N, D] (shared negatives)
    margin: float = 0.1,
) -> jax.Array:
    """Hinge max(0, margin + max_neg_sim - pos_sim) (model/loss.py:6-64).

    2-D ``negative`` is disambiguated by shape: leading dim == B means one
    PAIRED negative per row; any other leading dim is a SHARED pool (max
    over the pool). When the pool size equals the batch size the paired
    interpretation wins — pass the pool via ``shared_pool_max_margin_loss``
    (or as [1, N, D]) to force pool semantics."""
    pos_sim = jnp.sum(query * positive, axis=1)
    if negative.ndim == 3:
        neg_sim = jnp.einsum("bd,bnd->bn", query, negative)
        max_neg = jnp.max(neg_sim, axis=1)
    elif negative.ndim == 2 and negative.shape[0] != query.shape[0]:
        # Shared negative pool [N, D] (the reference shares one random
        # negative set across the batch, negative_sampler.py:114-115).
        neg_sim = query @ negative.T
        max_neg = jnp.max(neg_sim, axis=1)
    else:
        max_neg = jnp.sum(query * negative, axis=1)
    return jnp.mean(jax.nn.relu(margin + max_neg - pos_sim))


def shared_pool_max_margin_loss(
    query: jax.Array,      # [B, D]
    positive: jax.Array,   # [B, D]
    negative_pool: jax.Array,  # [N, D] shared across batch
    margin: float = 0.1,
) -> jax.Array:
    """Explicit shared-pool form: hinge against the hardest of N shared
    negatives per query."""
    pos_sim = jnp.sum(query * positive, axis=1)
    max_neg = jnp.max(query @ negative_pool.T, axis=1)
    return jnp.mean(jax.nn.relu(margin + max_neg - pos_sim))


def batch_hard_triplet_loss(
    query: jax.Array, positive: jax.Array, margin: float = 0.1
) -> jax.Array:
    """model/loss.py:66-113: hardest in-batch negative from the masked
    query-positive similarity matrix."""
    b = query.shape[0]
    sim = query @ positive.T
    eye = jnp.eye(b, dtype=sim.dtype)
    masked = sim * (1.0 - eye) - eye * 1e9
    hardest = jnp.max(masked, axis=1)
    pos_sim = jnp.sum(query * positive, axis=1)
    return jnp.mean(jax.nn.relu(margin + hardest - pos_sim))


def curriculum_loss(
    query: jax.Array,
    positive: jax.Array,
    random_negatives: jax.Array,          # [N, D] shared or [B, N, D]
    hard_negatives: jax.Array | None,     # [B, H, D] or None
    epoch,                                # int or traced scalar
    margin: float = 0.1,
    max_epochs: int = 10,
    hard_negative_factor: float = 2.0,
) -> jax.Array:
    """model/loss.py:143-176. Only the None-ness of hard negatives is static;
    ``epoch`` may be a traced scalar so the jitted train step does NOT
    recompile every epoch (hard_weight is 0 at epoch 0, subsuming the
    reference's epoch<1 branch). A 2-D ``random_negatives`` is always the
    shared pool — never row-paired — so a pool that happens to equal the
    batch size can't silently change the objective."""
    if random_negatives.ndim == 2:
        base = shared_pool_max_margin_loss(query, positive, random_negatives,
                                           margin)
    else:
        base = max_margin_loss(query, positive, random_negatives, margin)
    if hard_negatives is None:
        return base
    hard = max_margin_loss(query, positive, hard_negatives, margin)
    hard_weight = (
        jnp.minimum(jnp.asarray(epoch, jnp.float32), float(max_epochs))
        / max_epochs * hard_negative_factor
    )
    return base + hard_weight * hard


def cosine_objective(query: jax.Array, positive: jax.Array) -> jax.Array:
    """The reference's shipped simplified objective: -mean(sum(q*p))
    (train.py:75-78)."""
    return -jnp.mean(jnp.sum(query * positive, axis=1))


def nce_loss(
    query: jax.Array,            # [B, D]
    positive: jax.Array,         # [B, D]
    negative_pool: jax.Array,    # [N, D] shared negatives
    hard_negatives: jax.Array | None = None,  # [B, H, D]
    temperature: float = 0.1,
) -> jax.Array:
    """Sampled-softmax (InfoNCE) objective — the framework's default.

    Cross-entropy of the positive against the shared negative pool (plus
    optional per-query hard negatives, which is the natural curriculum
    integration). Chosen over the reference's max-over-negatives hinge
    (model/loss.py:6-64) because the hinge collapses on unit-sphere
    embeddings: attraction from every pair outweighs repulsion from the
    single hardest negative, and all-identical embeddings sit at loss ==
    margin (measured; see train/trainer.py). Softmax repels from *all*
    negatives at once and is the standard two-tower retrieval objective.
    """
    pos = jnp.sum(query * positive, axis=1) / temperature        # [B]
    neg = (query @ negative_pool.T) / temperature                # [B, N]
    logits = [pos[:, None], neg]
    if hard_negatives is not None:
        hard = jnp.einsum("bd,bhd->bh", query, hard_negatives) / temperature
        logits.append(hard)
    logits = jnp.concatenate(logits, axis=1)
    return -jnp.mean(jax.nn.log_softmax(logits, axis=1)[:, 0])
