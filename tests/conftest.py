"""Test harness configuration.

Tests run hermetically on CPU with 8 virtual devices — the analog of the
reference's `noarch`/LIBXSMM_TARGET cross-ISA validation trick (SURVEY.md §4):
Pallas kernels run in interpreter mode, multi-chip sharding runs on the
virtual device mesh, and everything is validated against numpy float64 gold
via the matdiff 1e-3 rel-Frobenius gate (tests/gemm.c:224 in the reference).

Run on real TPU instead with: XSMM_TEST_TPU=1 python -m pytest tests/
"""

import os

if not os.environ.get("XSMM_TEST_TPU"):
    # Must run before the first jax backend initialization.  Note: on axon
    # TPU terminals a sitecustomize registers the axon PJRT plugin at
    # interpreter start and forces the platform, so setting the env var is
    # not enough — jax.config.update below is the authoritative override.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) >= 8, "virtual CPU device mesh missing"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
