"""Test configuration: run the suite on an 8-virtual-device CPU backend so
multi-device sharding paths (pjit/NamedSharding, see SURVEY.md §2.2) are
exercised without TPU hardware."""

import os

# The environment may preset JAX_PLATFORMS=axon (single TPU) and a
# sitecustomize that imports jax at interpreter startup, so env vars alone
# are not reliable; set the config explicitly before any backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(20200823)
