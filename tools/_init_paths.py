"""Make the repo root importable when tools/ scripts run directly, and pin
the JAX platform from the environment.

The env route alone (`JAX_PLATFORMS=cpu python tool.py`) is unreliable in
some deployments: plugin backends registered at import time can win the
platform race and a tool asked for CPU dies with a TPU backend error. Every
tool imports this module before jax device use, so re-asserting the choice
through jax.config makes the env var authoritative. DETECTRON_TPU_CPU_DEVICES
additionally sets the virtual CPU device count (multi-process CPU smoke
tests of the multi-host path)."""

import os
import sys

repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if repo_root not in sys.path:
    sys.path.insert(0, repo_root)

_platforms = os.environ.get("JAX_PLATFORMS")
_cpu_devs = os.environ.get("DETECTRON_TPU_CPU_DEVICES")
if _platforms or _cpu_devs:
    import jax

    if _platforms:
        jax.config.update("jax_platforms", _platforms)
    if _cpu_devs:
        jax.config.update("jax_num_cpu_devices", int(_cpu_devs))

# Persistent compile cache (same dir bench.py uses): tool reruns on the
# same shapes skip the multi-minute XLA compile. JAX_COMPILATION_CACHE_DIR
# overrides the dir; setting it to the EMPTY string disables the cache
# entirely (concurrent processes sharing one cache dir can abort in the
# native writer — multi-rank launchers must give each rank its own dir or
# opt out; see tests/test_multihost.py).
import jax as _jax  # noqa: E402

_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
