"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run against
``--xla_force_host_platform_device_count=8`` CPU devices instead, per the
test strategy in SURVEY.md §4.

This must run before the first ``import jax`` anywhere in the test session.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update
# works reliably for pinning the test session to the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the slow tier is XLA-compile-bound (10 distinct
# jitted train steps and several CLI graphs); caching compiled executables
# makes repeat runs of the full suite minutes faster.  Override the
# location with VST_TEST_CACHE_DIR=; set it empty to disable.
_cache = os.environ.get("VST_TEST_CACHE_DIR", "/tmp/vst_tpu_test_cache")
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
