"""Test environment: 8 virtual CPU devices (multi-chip emulation).

The TPU-native analog of multi-node testing without a cluster: an 8-device
host-platform mesh (see SURVEY.md §4). The environment presets
``jax_platforms=axon,cpu`` (a tunneled TPU), so we must override the config
*after* import — the env var alone is ignored.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Full-precision f32 matmuls for golden-value comparisons.
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
