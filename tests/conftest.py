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

# Silence XLA:CPU AOT-loader ERROR spam (harmless but ~23k lines through
# pytest's output capture; also hit by the CLI subprocess tests).
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

# The env var alone is not enough: the ambient axon PJRT plugin re-pins the
# platform at registration time, so pin it again at the config level.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# NO persistent compilation cache for the CPU suite.  This jaxlib's
# XLA:CPU AOT cache is broken two ways: (1) entries bake tuning hints
# (+prefer-no-scatter/+prefer-no-gather) into the target-feature string
# and the loader rejects them against the real host features (an E-line
# per load); (2) with the cache on, the 4-device-mesh training test
# deterministically SIGABRTs inside device_get when the full suite runs
# under pytest capture (passes with -s or with the cache off — verified
# both ways twice).  Cache-less is ~33 min vs ~13; correctness wins.
# TPU bench scripts keep the cache — TPU executables load fine.
