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
