"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The environment's patched jax build pins ``jax_platforms=axon,cpu`` (the TPU
tunnel) regardless of JAX_PLATFORMS, so we must override the *config* after
import, before any backend initializes — this keeps the test-suite on the
fake 8-device CPU backend (SURVEY.md §4's multi-chip-without-hardware trick)
and off the slow remote-compile path.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
