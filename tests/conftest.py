"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-host/multi-chip logic is exercised on CPU per SURVEY.md section 4
(XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

import os

# Tests always run on CPU with virtual devices (the real chip is reserved for
# bench runs); override any externally-set platform (e.g. axon TPU tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
# the suite hard-requires the documented 8-device CPU mesh — REPLACE any
# pre-set device count rather than honoring it (a CI wrapper or debug shell
# presetting 1 would otherwise fail every mesh test confusingly)
import re as _re
flags = _re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A sitecustomize hook may have programmatically forced the TPU platform
# (overriding the env var); backends initialize lazily, so resetting the
# config here still wins as long as no devices have been touched yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite is dominated by XLA CPU compiles on
# this 1-core host; repeat runs hit the cache and finish several times faster.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
