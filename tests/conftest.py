"""Test harness config.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths
compile and execute without TPU hardware (the driver separately
dry-runs the multi-chip path). Set JAX_PLATFORMS/XLA_FLAGS before jax
imports anything.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin's sitecustomize pins jax_platforms via
# jax.config, which wins over the env var — override it back to CPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_DIR = "/root/reference"


def reference_path(*parts: str) -> str:
    return os.path.join(REFERENCE_DIR, *parts)
