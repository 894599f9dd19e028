"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run without TPU hardware; multi-chip sharding logic is exercised
on a virtual CPU mesh per SURVEY §4.  The runtime environment may have
already imported jax (sitecustomize PJRT registration), so the platform is
switched via jax.config (effective as long as no backend is initialized yet)
rather than env vars.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Make the repo root importable so `import t3dct` resolves via the alias.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib  # noqa: E402

importlib.import_module("3deecelltracker_tpu")
