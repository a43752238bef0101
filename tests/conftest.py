"""Test configuration: run everything on a virtual 8-device CPU mesh.

The axon sitecustomize pre-registers the TPU backend, so setting env vars is
not enough -- we must flip jax_platforms through jax.config before any
computation runs.
"""
import os

try:
    # XLA:CPU recursion on the suite's largest program (the CuTR grad
    # step) overruns the default 8 MB main-thread stack late in a long
    # session (SIGSEGV observed 3x at test_train_step_reduces_loss, in
    # compile/serialize/deserialize paths; fresh processes pass).  The
    # main-thread stack grows on demand up to RLIMIT_STACK, so raise the
    # soft limit before any compilation.
    import resource

    resource.setrlimit(resource.RLIMIT_STACK, (512 << 20, resource.RLIM_INFINITY))
except (ImportError, ValueError, OSError):
    pass

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
