"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests run without TPU hardware.

The session environment boots an `axon` TPU-tunnel plugin via sitecustomize
that force-sets ``jax_platforms="axon,cpu"`` at import time, so env vars
alone don't win — override the config after importing jax, before any
backend is touched.
"""

import os

os.environ.setdefault("OMP_NUM_THREADS", "1")  # keep the 1-core CI box sane

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
