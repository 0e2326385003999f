"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

The reference has no tests at all (SURVEY.md §4); our pyramid runs every
multi-device path on a virtual CPU mesh so sharding logic is exercised
without TPU hardware.
"""

import os
import sys

_platform = os.environ.get("COSA_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The sandbox's sitecustomize.py force-registers a TPU backend via
# jax.config.update("jax_platforms", ...) at interpreter start, which wins
# over the env var — update the live config back.
import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
