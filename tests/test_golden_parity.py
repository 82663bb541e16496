"""Golden parity vs the reference's shipped checkpoint.

Loads the PyTorch ``best_model.pt`` weights (reference
checkpoints/best_model.pt — in=128, hidden=256, out=128, 2 GraphConv layers)
into the JAX parameter pytree and checks that our forward paths reproduce the
reference math on the same inputs to float tolerance (SURVEY.md §4b).

The torch-side expected values are computed here from the documented formulas
(model/pinsage.py:205-214 MLP path; :217-240 pooling path) — not by importing
reference code.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from movie_recommendation_engine_tpu.models import pinsage

CKPT = "/root/reference/checkpoints/best_model.pt"


@pytest.fixture(scope="module")
def torch_state():
    if not os.path.exists(CKPT):
        pytest.skip("reference checkpoint not available")
    ck = torch.load(CKPT, map_location="cpu")
    return {k: v.numpy() for k, v in ck["model_state_dict"].items()}


def _to_jax_params(sd) -> dict:
    from movie_recommendation_engine_tpu.utils.torch_import import (
        params_from_torch_state_dict,
    )

    return params_from_torch_state_dict(sd)


def _torch_mlp_path(sd, x):
    """Reference MLP path formula (model/pinsage.py:205-214)."""
    t = torch.from_numpy(x)

    def lin(prefix, v):
        w = torch.from_numpy(sd[f"{prefix}.weight"])
        b = torch.from_numpy(sd[f"{prefix}.bias"])
        return v @ w.T + b

    h = torch.relu(lin("input_proj", t))
    for i in range(2):
        h = torch.relu(lin(f"convs.{i}.lin_self", h))
    out = lin("output_proj", h)
    return torch.nn.functional.normalize(out, p=2, dim=1).numpy()


def _torch_pooling_path(sd, x, nbrs, weights):
    """Reference importance-pooling path formula (model/pinsage.py:217-240),
    dense [N, K] form with weight renormalization."""
    t = torch.from_numpy(x)

    def lin(prefix, v):
        w = torch.from_numpy(sd[f"{prefix}.weight"])
        b = torch.from_numpy(sd[f"{prefix}.bias"])
        return v @ w.T + b

    h = torch.relu(lin("input_proj", t))
    nb = torch.from_numpy(nbrs).long()
    w = torch.from_numpy(weights)
    w = w / w.sum(dim=1, keepdim=True)
    for i in range(2):
        h_neigh = (h[nb] * w.unsqueeze(-1)).sum(1)
        h_self = lin(f"convs.{i}.lin_self", h)
        h = torch.relu(lin(f"convs.{i}.lin_update",
                           torch.cat([h_self, h_neigh], dim=1)))
        h = torch.nn.functional.normalize(h, p=2, dim=1)
    out = lin("output_proj", h)
    return torch.nn.functional.normalize(out, p=2, dim=1).numpy()


def test_mlp_path_parity(torch_state):
    params = _to_jax_params(torch_state)
    assert pinsage.num_params(params) == 591744
    rng = np.random.default_rng(0)
    x = rng.standard_normal((32, 128)).astype(np.float32)
    ours = np.asarray(pinsage.mlp_forward(params, jnp.asarray(x), dtype=jnp.float32))
    ref = _torch_mlp_path(torch_state, x)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_pooling_path_parity(torch_state):
    params = _to_jax_params(torch_state)
    rng = np.random.default_rng(1)
    n, k = 24, 5
    x = rng.standard_normal((n, 128)).astype(np.float32)
    nbrs = rng.integers(0, n, (n, k)).astype(np.int32)
    w = (rng.random((n, k)) + 0.1).astype(np.float32)
    ours = np.asarray(pinsage.pooled_forward(
        params, jnp.asarray(x), [jnp.asarray(nbrs)] * 2, [jnp.asarray(w)] * 2,
        dtype=jnp.float32,
    ))
    ref = _torch_pooling_path(torch_state, x, nbrs, w)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_bf16_path_close_to_f32(torch_state):
    """The production bf16 matmul path must track f32 within bf16 tolerance."""
    params = _to_jax_params(torch_state)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((16, 128)).astype(np.float32)
    f32 = np.asarray(pinsage.mlp_forward(params, jnp.asarray(x), dtype=jnp.float32))
    bf16 = np.asarray(pinsage.mlp_forward(params, jnp.asarray(x), dtype=jnp.bfloat16))
    # Unit-norm outputs: compare cosine alignment.
    cos = (f32 * bf16).sum(axis=1)
    assert cos.min() > 0.995
