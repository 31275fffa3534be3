"""Test configuration: force an 8-device virtual CPU mesh.

Note: /root/.axon_site/sitecustomize.py imports jax at interpreter startup,
so env vars set here are too late for jax.config defaults — we must update
the config explicitly (backends are still uninitialized at conftest time).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
