"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so the multi-chip sharding paths
(`parallel/`) exercise real collectives without TPU hardware (SURVEY.md §4
item 4).

Note: this container's sitecustomize imports jax and registers the 'axon' TPU
platform before pytest starts, so env vars are already latched — we must flip
the platform through jax.config instead.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
