"""Persistent XLA compilation cache setup.

Full-BSDF integrator compiles are expensive (minutes via the remote TPU
compile service); caching compiled executables across processes makes tests
and repeated renders fast. Enabled by default to a repo-local directory;
override with PLATINUM_TPU_CACHE_DIR or disable with PLATINUM_TPU_NO_CACHE=1.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "platinum_tpu", "xla")
_done = False


def enable_compilation_cache():
    global _done
    if _done or os.environ.get("PLATINUM_TPU_NO_CACHE") == "1":
        return
    import jax

    # Scope the cache per backend: XLA:CPU AOT artifacts encode host CPU
    # features and are not portable across machines (SIGILL risk).
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    path = os.path.join(
        os.environ.get("PLATINUM_TPU_CACHE_DIR", _DEFAULT), backend
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _done = True
