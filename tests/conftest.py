"""Test environment: force CPU with 8 virtual devices so sharding tests
run without TPU hardware (and tests are deterministic/fast).

Note: the surrounding environment may pin JAX_PLATFORMS=axon (the TPU
tunnel); the env var alone does not win, so we also use
jax.config.update before any devices are touched.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: the training/encoding while_loops are
# compiled once per shape; reuse across tests and subprocesses.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_yttm")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
# CPU compiles are cheap: let the stream encoder size its chunks to the
# input so tiny test batches stay fast.
os.environ.setdefault("YTTM_STREAM_ADAPTIVE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
