"""Test configuration: force an 8-device CPU mesh.

Tests never require real TPU hardware; multi-chip sharding is exercised on
a virtual CPU mesh (this substitutes for the reference's absent distributed
test story, see SURVEY.md section 4).

NOTE: this environment preloads a TPU PJRT plugin via sitecustomize and
sets JAX_PLATFORMS before pytest starts, so plain env manipulation is too
late - ``jax.config.update`` is the reliable switch.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")
