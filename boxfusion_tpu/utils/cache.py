"""Persistent XLA compilation cache.

The device-resident keyframe step is one large jitted program; its first
compile costs minutes.  The persistent cache makes that a one-time cost per
machine instead of per process.

The cache directory is scoped by a MACHINE FINGERPRINT (cpu flags + jaxlib
version): XLA:CPU AOT executables bake in the compile host's vector ISA
(amx/avx512 feature set), and the cache key does NOT cover it -- loading an
entry produced on a host with a different feature set segfaults inside
``compilation_cache.get_executable_and_time`` (observed 2026-08-21: a
cache written on an amx-avx512 host SIGSEGVed this host's test suite at
33 files in).  Per-fingerprint directories make a foreign cache invisible
instead of fatal.
"""
from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "boxfusion_tpu_xla")
_enabled = False


def _machine_tag() -> str:
    """Stable fingerprint of everything an AOT executable bakes in."""
    import hashlib
    import platform

    bits = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if ln.startswith("flags"):
                    bits.append(ln.strip())
                    break
    except OSError:
        pass
    try:
        import jaxlib

        bits.append(jaxlib.__version__)
    except Exception:
        pass
    return hashlib.sha1(" ".join(bits).encode()).hexdigest()[:12]


def _forced_multidevice_cpu() -> bool:
    """True when this process runs the virtual multi-device CPU platform
    (tests / multichip dryruns).  Serializing MESH-SHARDED XLA:CPU
    executables into the persistent cache segfaults on this jaxlib
    (observed 2026-08-21: `put_executable_and_time` SIGSEGV compiling the
    sharded train step under --xla_force_host_platform_device_count=8;
    single-device CPU and TPU entries round-trip fine), so the cache is
    skipped entirely for that configuration."""
    flags = os.environ.get("XLA_FLAGS", "")
    for tok in flags.split():
        if tok.startswith("--xla_force_host_platform_device_count="):
            try:
                return int(tok.split("=", 1)[1]) > 1
            except ValueError:
                return True
    return False


def raise_stack_limit(soft: int = 512 << 20) -> None:
    """Raise RLIMIT_STACK: XLA:CPU's pass recursion on the largest programs
    (the CuTR grad step) can overrun the default 8 MB main-thread stack in
    long-lived processes (tests/conftest.py documents the observed
    SIGSEGVs).  The main-thread stack grows on demand up to the soft
    limit, so raising it is effective mid-process."""
    try:
        import resource

        cur_soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
        if cur_soft != resource.RLIM_INFINITY and cur_soft < soft:
            resource.setrlimit(resource.RLIMIT_STACK, (soft, hard))
    except (ImportError, ValueError, OSError):
        pass


def enable_compilation_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    raise_stack_limit()
    if _forced_multidevice_cpu():
        _enabled = True  # deliberate no-op (see _forced_multidevice_cpu)
        return
    import jax

    base = path or os.environ.get("BOXFUSION_XLA_CACHE", _DEFAULT)
    cache_dir = os.path.join(base, _machine_tag())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
