"""Test configuration: force CPU backend with 8 virtual devices so the
multi-chip sharding paths (mesh/pjit/shard_map) are exercised without
TPU hardware, per the driver contract.

NOTE: setting os.environ["JAX_PLATFORMS"] is NOT enough in this image —
a sitecustomize (PYTHONPATH=/root/.axon_site) pins JAX_PLATFORMS=axon
before conftest runs, and the env route silently loses. The config
update below is authoritative; the assertion guards against silently
running the "CPU" suite on the tunneled TPU again."""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

# Persistent compilation cache: first jit on this host is ~9s, so cache
# every entry to make test reruns cheap.
jax.config.update("jax_compilation_cache_dir", "/tmp/kbslam_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
