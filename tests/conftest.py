"""Test harness: force an 8-virtual-device CPU mesh before JAX initializes.

Multi-chip sharding paths are validated on this fake mesh (SURVEY.md §4);
real-TPU runs use bench.py / the CLI drivers instead.

Note: the environment's axon TPU plugin re-registers itself at interpreter
start and programmatically sets jax_platforms, so plain JAX_PLATFORMS env
vars are NOT enough — the config must be updated after importing jax and
before any backend initialization.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
