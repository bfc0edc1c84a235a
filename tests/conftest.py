"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (the PoCL-style fake-backend strategy of the reference CI,
/root/reference/test/backends.jl:51-65)."""

import os

# Force CPU: the ambient environment points JAX_PLATFORMS at the axon TPU
# tunnel, where every jit compile pays ~30-50s — tests must run on the local
# 8-virtual-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compilation cache: jit compiles dominate test wall-time on
# the 2-vCPU test machine; cache them across runs.
import jax  # noqa: E402

# The jaxtyping pytest plugin imports jax BEFORE this conftest runs, so the
# env var above can be captured too late — force the platform via config too
# (otherwise jits hang waiting on the axon TPU tunnel).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/examodels_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
# XLA_FLAGS can be captured too early the same way; the config knob wins as
# long as the CPU client has not initialized yet.
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: XLA_FLAGS above is the only path
