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

# Persistent XLA compile cache: the suite is compile-dominated (34m at round
# 3, ~all of it jit compiles of the same programs every run). Cached
# executables are keyed on HLO + flags + topology, so the 8-device virtual
# mesh reuses them across runs; min_compile_time 0.5s skips tiny programs
# whose disk round-trip would cost more than the compile.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "JAX_TEST_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "artspeech_tpu_xla_tests"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
