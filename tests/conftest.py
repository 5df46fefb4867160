"""Test configuration: force an 8-virtual-device CPU platform.

All tests run on CPU with 8 fake devices so sharding/collective behavior is
exercised without TPU hardware (SURVEY.md §4 item 4). Note: on this image
the JAX_PLATFORMS env var is overridden by the TPU plugin, so the platform
must be forced via jax.config before the backend initializes.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
