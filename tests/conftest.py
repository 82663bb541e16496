"""Test harness: force an 8-device virtual CPU mesh BEFORE jax initializes.

This exercises the exact pjit/NamedSharding/shard_map code paths the TPU
build uses, single-process (SURVEY.md §4c) — the standard JAX multi-host
testing recipe.
"""

import os

# Hard-override: the ambient environment may point JAX at the real TPU
# (a sitecustomize registers the 'axon' PJRT plugin and forces
# JAX_PLATFORMS=axon in every process); unit tests always run on the
# virtual CPU mesh, so force the platform through jax.config, which wins
# over both the env var and the plugin registration.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def tiny_data():
    from movie_recommendation_engine_tpu import small_test_config
    from movie_recommendation_engine_tpu.graph import dataset

    cfg = small_test_config()
    return cfg, dataset.load(cfg)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
