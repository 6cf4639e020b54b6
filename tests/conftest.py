"""Test config: run JAX on CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (the reference had no analogous
capability — its multi-GPU paths were only testable on a GPU box).

Note: some installed packages register pytest plugins that import jax before
this conftest runs, so env vars are too late; jax.config.update works until
the backend is actually initialized (first array op), which no plugin does.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compilation cache makes repeat test runs fast. Tests get their
# OWN cache dir: sharing /tmp/jax_cache with a concurrently-running TPU
# benchmark process produced intermittent native aborts (cache write race).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _fresh_cfg():
    """Reset the global cfg around every test."""
    from detectron_tpu.core import config

    config.reset_cfg()
    yield
    config.reset_cfg()
