"""Test env: force CPU with 8 virtual devices so multi-chip sharding tests
run without TPU hardware (SURVEY.md §4 'multi-device tests runnable on CPU').

The container's sitecustomize registers the tunneled TPU ('axon') backend and
forces jax_platforms='axon,cpu' via jax.config — an env var alone can't win,
so we update the config after import, before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
