"""Test env: force CPU with 8 virtual devices so mesh/pjit tests run anywhere.

The TPU image's sitecustomize imports jax at interpreter startup (before this
file), so mutating JAX_PLATFORMS here is too late for jax's env snapshot —
but backends initialize lazily, so `jax.config.update` still wins as long as
no jax op has run yet. XLA_FLAGS is read at CPU-client init, which also
happens after conftest loads.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from step_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()
