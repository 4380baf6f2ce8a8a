"""Optional platform selection for CLI entry points.

Some environments pin ``jax_platforms`` after import (e.g. a TPU-tunnel
sitecustomize), so plain ``JAX_PLATFORMS`` doesn't stick.  The CLIs call
``configure_from_env()`` first thing; set

  FOOTPRINTS_PLATFORM=cpu            # run on host CPU
  FOOTPRINTS_NUM_CPU_DEVICES=8       # virtual CPU device count (sharding dev)

to steer them.  Unset -> whatever the environment provides (the TPU).
"""

import os


def configure_from_env():
    platform = os.environ.get("FOOTPRINTS_PLATFORM")
    n_cpu = os.environ.get("FOOTPRINTS_NUM_CPU_DEVICES")
    if not platform and not n_cpu:
        return
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    if n_cpu:
        jax.config.update("jax_num_cpu_devices", int(n_cpu))
