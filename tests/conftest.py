"""Test configuration: CPU backend with 8 virtual devices (for sharding
tests) and x64 enabled (f64 CPU ground truth, mirroring the reference's
double-precision Reference platform role — SURVEY.md section 4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the environment may pre-register an accelerator plugin and force its
# platform; tests run on (virtual 8-device) CPU in f64
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# the test suite is XLA-CPU-compile-dominated; the persistent cache makes
# repeat runs of the fast tier several times faster (must go through
# jax.config.update — the env var is read before user code runs, see
# utils/compile_cache.py).  /tmp so test executables never bloat the
# committed repo cache.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax-test-cache")
