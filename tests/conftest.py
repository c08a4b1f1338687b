"""Test configuration: run everything on CPU in float64 with a fake
8-device mesh for multi-chip sharding tests.

Note: the axon sitecustomize force-registers the TPU plugin and sets
jax_platforms=axon at import time, so the platform must be overridden via
jax.config *after* importing jax (env vars alone are ignored).
"""

import os

# must be set before the backend initializes
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the integral-engine graphs dominate test
# wall time and are identical across runs
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/evcont_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
