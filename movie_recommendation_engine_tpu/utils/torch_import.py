"""Import PyTorch reference checkpoints into the JAX parameter pytree.

Migration path for users of the reference implementation: a checkpoint saved
by its training loop (train.py:102-112 — a dict with ``model_state_dict``)
loads directly into this framework's PinSage parameters. Linear weights are
transposed (torch stores [out, in]; we store [in, out]). Forward-pass parity
of the imported weights is covered by tests/test_golden_parity.py.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp


def params_from_torch_state_dict(sd: dict[str, Any]) -> dict:
    """torch ``model_state_dict`` (tensor or ndarray values) -> params pytree."""
    def to_np(v):
        return v.numpy() if hasattr(v, "numpy") else v

    def lin(prefix):
        return {
            "w": jnp.asarray(to_np(sd[f"{prefix}.weight"]).T.copy()),
            "b": jnp.asarray(to_np(sd[f"{prefix}.bias"]).copy()),
        }

    conv_ids = sorted({int(k.split(".")[1]) for k in sd if k.startswith("convs.")})
    return {
        "input_proj": lin("input_proj"),
        "convs": [
            {
                "self": lin(f"convs.{i}.lin_self"),
                "neigh": lin(f"convs.{i}.lin_neigh"),
                "update": lin(f"convs.{i}.lin_update"),
            }
            for i in conv_ids
        ],
        "output_proj": lin("output_proj"),
    }


def load_torch_checkpoint(path: str) -> tuple[dict, dict]:
    """Load a reference ``.pt`` checkpoint -> (params pytree, metadata).

    Requires torch to deserialize the pickle; raises ImportError otherwise.
    """
    import torch

    ck = torch.load(path, map_location="cpu")
    sd = ck["model_state_dict"] if "model_state_dict" in ck else ck
    meta = {k: v for k, v in ck.items()
            if k not in ("model_state_dict", "optimizer_state_dict")}
    return params_from_torch_state_dict(sd), meta
