"""Test configuration: run on CPU with 8 virtual devices.

Mirrors the reference's strategy of testing multi-party/multi-device logic
in-process (SURVEY.md §4): shardings are validated on a virtual CPU mesh;
the real TPU is exercised by bench.py / the driver.

Must run before any jax import, hence the env mutation at module top.
"""

import os

# The image's sitecustomize pre-imports jax and pins JAX_PLATFORMS=axon (the
# TPU tunnel). Env mutation is therefore too late — jax.config.update is the
# only reliable override. Running tests over the tunnel is both wrong (it
# serializes clients) and ~100x slower (eager ops pay a network RTT each).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: identical (shape, level) programs are
# recompiled constantly across test runs; caching them cuts suite time ~10x.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
