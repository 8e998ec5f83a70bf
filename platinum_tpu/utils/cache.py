"""Persistent XLA compilation cache setup.

Full-BSDF integrator compiles are expensive (minutes via the remote TPU
compile service); caching compiled executables across processes makes tests
and repeated renders fast. Enabled by default to a repo-local directory;
override with PLATINUM_TPU_CACHE_DIR or disable with PLATINUM_TPU_NO_CACHE=1.
"""

from __future__ import annotations

import hashlib
import os

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "platinum_tpu", "xla")
_done = False


def _host_fingerprint() -> str:
    """Hash of the host CPU's feature flags + model.

    XLA:CPU AOT artifacts encode host CPU features; an artifact cached on
    one machine and loaded on another with a different ISA extension set
    crashes at load (SIGILL/SIGSEGV inside deserialization). Keying the
    CPU-backend cache directory on the feature set makes a new host start
    a fresh cache instead of loading foreign executables.
    """
    try:
        with open("/proc/cpuinfo") as f:
            text = f.read()
        lines = [
            ln for ln in text.splitlines()
            if ln.startswith(("flags", "model name", "Features"))
        ]
        return hashlib.sha256("\n".join(sorted(set(lines))).encode()).hexdigest()[:12]
    except OSError:
        import platform

        return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


def enable_compilation_cache():
    global _done
    if _done or os.environ.get("PLATINUM_TPU_NO_CACHE") == "1":
        return
    import jax

    # Scope the cache per backend: XLA:CPU AOT artifacts encode host CPU
    # features and are not portable across machines (SIGILL risk) — the CPU
    # backend additionally gets a per-host-CPU fingerprint subdirectory.
    # TPU executables come from the TPU compiler and are host-portable.
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    # TPU executables are host-portable whichever plugin serves the chip
    # (plain "tpu" or the tunneled "axon" backend); everything else gets
    # the per-host-CPU scope
    scope = (backend if backend in ("tpu", "axon")
             else f"{backend}-{_host_fingerprint()}")
    path = os.path.join(
        os.environ.get("PLATINUM_TPU_CACHE_DIR", _DEFAULT), scope
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _done = True
