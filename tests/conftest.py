"""Test config: run JAX on a virtual 8-device CPU mesh.

This is the TPU-world answer to testing multi-chip paths without hardware
(SURVEY.md §4): XLA fakes 8 host devices, so sharding/pjit code compiles and
executes collectives exactly as it would across real chips.

Note: this environment's sitecustomize force-registers the axon TPU plugin
and overrides JAX_PLATFORMS, so we must select the CPU platform via
jax.config *after* import (before first backend use).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute tests (multi-process runs etc.)"
    )
