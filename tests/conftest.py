"""Test harness configuration.

Mirrors the reference's test strategy (SURVEY.md section 4): every sharded
op is validated against a single-device reference on the assembled global
array. Multi-device is simulated with 8 virtual CPU devices (the analogue of
the reference CI's ``mpiexec -n 4`` on one runner,
/root/reference/Makefile:90-92).
"""

import os
import sys

# Force CPU with 8 virtual devices BEFORE importing jax anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon sitecustomize hook force-registers the TPU backend and overrides
# JAX_PLATFORMS; override it back - tests run on virtual CPU devices.
jax.config.update("jax_platforms", "cpu")
# double precision tier of the reference test matrix needs x64
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the suite is compilation-dominated (hundreds of
# small jitted programs); repeat runs drop from ~12 min to a fraction
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_cpu_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import pytest  # noqa: E402


@pytest.fixture(params=["single", "double"])
def precision(request):
    return request.param
