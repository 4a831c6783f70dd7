"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The multi-chip sharding paths are validated without real TPU hardware via
XLA's host-platform device-count override (SURVEY.md §4: this fills the
"test multi-node without a real cluster" gap the reference never solved).
"""
import os

# Force override: the ambient environment pins JAX_PLATFORMS to the real
# TPU platform; the unit/sharding suite must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
# 4 virtual devices: matches the physical core count of the dev box — more
# virtual devices than cores makes XLA:CPU's per-device thread pools
# spin-wait (observed 6x wall-time blowup at 8 devices on 4 cores).  The
# driver's dryrun_multichip validates the 8-device mesh path separately.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax  # noqa: E402

# The env var alone is not enough: the ambient axon PJRT plugin re-pins the
# platform at registration time, so pin it again at the config level.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: compiles in this environment are slow
# (remote-compile relay), so cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
