"""Test configuration: run everything on a virtual 8-device CPU mesh.

The axon sitecustomize pre-registers the TPU backend, so setting env vars is
not enough -- we must flip jax_platforms through jax.config before any
computation runs.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
