"""Test environment: force a virtual 8-device CPU platform.

Shard/sharding tests must run without a multi-chip TPU (SURVEY.md §4): JAX's
standard fake-multi-device CPU setup. This executes before any test module
imports jax.

Note: this session's sitecustomize registers the 'axon' TPU plugin and calls
``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter startup,
which overrides the JAX_PLATFORMS env var — so we must update the jax config
*after* import (backends initialize lazily, so this takes effect as long as
it runs before the first jax computation; pytest imports conftest before any
test module).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# never let a test attempt a real network fetch (zero-egress rig; the
# download engine is tested against a local HTTP server instead)
os.environ["IRTPU_OFFLINE"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")
