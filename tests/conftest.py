"""Test configuration.

Device-path tests run on a virtual 8-device CPU platform so that sharding
is exercised without TPU hardware (the driver's dryrun does the same).
Set FULGOR_TPU_TEST_REAL=1 to run on whatever JAX finds instead.
"""

import os

if not os.environ.get("FULGOR_TPU_TEST_REAL"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The axon TPU plugin ignores the JAX_PLATFORMS env var; the config
    # knob does stick if set before backend initialization. Set BOTH: the
    # fulgor_tpu package re-asserts the env var's value onto the config at
    # import (so `JAX_PLATFORMS=cpu fulgor ...` works), which would stomp
    # a config-only override here with the harness's ambient value.
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: the mini-dictionary probe graphs are large
    # and recompiling them on every pytest run dominates suite time
    cache = os.path.join(os.path.expanduser("~"), ".cache", "fulgor_tpu_xla_tests")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "device: <5-min cold-cache smoke subset (tiny widths, one pass "
        "through each query strategy's device graph); run with -m device",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
