"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

SURVEY.md §4: "multi-node without a cluster" — sharded batch decode is
tested on CPU with XLA's host-platform device multiplexing
(xla_force_host_platform_device_count), matching the driver's
dryrun_multichip environment.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xA1AC)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
