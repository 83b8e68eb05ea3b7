"""Test config: run everything on a virtual 8-device CPU mesh.

The container pins JAX_PLATFORMS=axon (remote TPU tunnel) via sitecustomize,
so the override must be forced, not defaulted: tests need determinism, fp32
matmuls and 8 virtual devices, none of which the single remote chip gives.
The reference could only exercise its distributed paths on real GPUs
(SURVEY.md §4); here every sharded code path runs on any machine.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_enable_x64", False)

# Persistent XLA compile cache: the suite is compile-bound on this 1-core
# host (~50 min cold); re-runs hit the cache and skip XLA entirely.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except Exception:
    pass

assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()
