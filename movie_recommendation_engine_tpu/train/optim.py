"""In-repo optimizer + LR schedule: Adam and reduce-on-plateau.

TPU-native equivalent of the reference's ``torch.optim.Adam`` +
``ReduceLROnPlateau`` (run.py:117-122). Pure functions over pytrees so the
update lives inside the jitted train step; the plateau schedule is host-side
logic between epochs (as in the reference, run.py:131 scheduler.step(loss)).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    step: jax.Array   # scalar int32
    mu: Any           # first-moment pytree
    nu: Any           # second-moment pytree


def adam_init(params: Any) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(step=jnp.zeros((), jnp.int32), mu=zeros,
                     nu=jax.tree_util.tree_map(jnp.zeros_like, params))


def adam_update(
    grads: Any,
    state: AdamState,
    params: Any,
    lr: jax.Array | float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> tuple[Any, AdamState]:
    """Matches torch.optim.Adam defaults (betas=(0.9, 0.999), eps=1e-8)."""
    step = state.step + 1
    mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
    t = step.astype(jnp.float32)
    c1 = 1.0 - b1 ** t
    c2 = 1.0 - b2 ** t
    new_params = jax.tree_util.tree_map(
        lambda p, m, v: p - lr * (m / c1) / (jnp.sqrt(v / c2) + eps),
        params, mu, nu,
    )
    return new_params, AdamState(step=step, mu=mu, nu=nu)


class PlateauState(NamedTuple):
    """ReduceLROnPlateau bookkeeping (mode='min' on train loss, matching
    run.py:117-122 factor=0.5 patience=2)."""

    lr: float
    best: float
    num_bad: int


def plateau_init(lr: float) -> PlateauState:
    return PlateauState(lr=lr, best=float("inf"), num_bad=0)


def plateau_step(
    state: PlateauState,
    metric: float,
    factor: float = 0.5,
    patience: int = 2,
    min_lr: float = 0.0,
) -> PlateauState:
    if metric < state.best - 1e-12:
        return PlateauState(lr=state.lr, best=metric, num_bad=0)
    num_bad = state.num_bad + 1
    if num_bad > patience:
        return PlateauState(lr=max(state.lr * factor, min_lr), best=state.best, num_bad=0)
    return PlateauState(lr=state.lr, best=state.best, num_bad=num_bad)


class EarlyStopping:
    """Patience-based early stop on a maximized validation metric
    (train.py:113-117, config.py:46 PATIENCE=3)."""

    def __init__(self, patience: int = 3):
        self.patience = patience
        self.best = -float("inf")
        self.num_bad = 0

    def update(self, metric: float) -> bool:
        """Returns True when training should stop."""
        if metric > self.best:
            self.best = metric
            self.num_bad = 0
            return False
        self.num_bad += 1
        return self.num_bad >= self.patience
