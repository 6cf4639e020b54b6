"""Test config: run JAX on CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (the reference had no analogous
capability — its multi-GPU paths were only testable on a GPU box)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402
import jax  # noqa: E402

# Persistent compilation cache makes repeat test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(autouse=True)
def _fresh_cfg():
    """Reset the global cfg around every test."""
    from detectron_tpu.core import config

    config.reset_cfg()
    yield
    config.reset_cfg()
