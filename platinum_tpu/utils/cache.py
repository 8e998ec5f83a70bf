"""Persistent XLA compilation cache setup, hardened against poisoned entries.

Full-BSDF integrator compiles are expensive (minutes via the remote TPU
compile service); caching compiled executables across processes makes tests
and repeated renders fast. Enabled by default to a repo-local directory;
override with PLATINUM_TPU_CACHE_DIR or disable with PLATINUM_TPU_NO_CACHE=1.

Why the hardening: XLA:CPU serializes large executables as AOT results that
embed the *compile machine's* LLVM target features (the comma-joined
"+64bit,+adx,..." attribute string, including model-derived tuning features
like +prefer-no-gather that are NOT /proc/cpuinfo ISA flags). Loading such an
entry in a process whose LLVM host detection differs crashes with a native
abort that Python cannot catch (observed: rc=134 in cpu_aot_loader.cc).  Two
processes can disagree even on hosts with identical cpuinfo `flags` lines —
e.g. a fleet VM migrating across physical machines with different microcode
or CPU steppings, which changes LLVM's tuning-feature selection.

Defense in depth, both layers required:

1. **Scope key** — the cache directory is keyed on everything known to feed
   LLVM host detection and XLA codegen: jax/jaxlib versions, the *stable*
   /proc/cpuinfo lines (vendor/family/model/stepping/microcode/flags/bugs —
   round 3 keyed only on flags+model name, which missed microcode-driven
   tuning drift), XLA_FLAGS, and the JAX platform env. Different targets
   never share a directory.

2. **Enable-time entry scan** — before pointing jax at the scope directory,
   every not-yet-scanned entry is stream-decompressed and searched for
   embedded target-feature strings; entries whose features differ from a
   witness (a canary compile in *this* process, so it reflects exactly what
   our loader expects) are moved to a quarantine subdirectory instead of
   ever being loadable. Corrupt (undecompressable) entries are quarantined
   too. This makes a polluted cache dir safe no matter how it got polluted.
   Scan results are stamped per entry so the cost is paid once per new file.

Set PLATINUM_TPU_CACHE_UNSAFE=1 to skip layer 2 (not recommended).
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import tempfile

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "platinum_tpu", "xla")
_done = False

# LLVM "target-features" attribute string as embedded in XLA:CPU AOT results.
# x86 always leads with +64bit / -64bit on the targets we run on; the list is
# long (dozens of features) so require a healthy comma-joined tail to avoid
# matching stray text.
_FEAT_RE = re.compile(rb"[+\-]64bit[,+\-a-zA-Z0-9.]{32,}")
_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


def _stable_cpuinfo() -> str:
    """The /proc/cpuinfo lines that feed LLVM host CPU/feature detection.

    Includes microcode, stepping and bugs: LLVM's *tuning* features (e.g.
    +prefer-no-gather) are selected from the detected CPU model/mitigation
    state, not from the ISA `flags` line, so hashing flags alone (round 3's
    key) does not separate hosts that compile incompatible AOT artifacts.
    Volatile lines (cpu MHz, bogomips, core ids) are excluded.
    """
    keys = (
        "vendor_id", "cpu family", "model", "model name", "stepping",
        "microcode", "flags", "bugs", "address sizes",
        # arm64 spellings
        "CPU implementer", "CPU architecture", "CPU variant", "CPU part",
        "CPU revision", "Features",
    )
    try:
        with open("/proc/cpuinfo") as f:
            text = f.read()
    except OSError:
        import platform

        return f"processor={platform.processor()}"
    lines = [
        ln.strip() for ln in text.splitlines()
        if ln.split(":")[0].strip() in keys
    ]
    return "\n".join(sorted(set(lines)))


def _scope_name() -> str:
    import jax
    import jaxlib

    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    versions = f"jax={jax.__version__};jaxlib={jaxlib.__version__}"
    if backend in ("tpu", "axon"):
        # TPU executables come from the TPU compiler and are host-portable;
        # key only on the software versions.
        key = versions
        tag = "tpu"
    else:
        key = "\n".join([
            versions,
            _stable_cpuinfo(),
            "XLA_FLAGS=" + os.environ.get("XLA_FLAGS", ""),
            "JAX_PLATFORMS=" + os.environ.get("JAX_PLATFORMS", ""),
            "JAX_PLATFORM_NAME=" + os.environ.get("JAX_PLATFORM_NAME", ""),
        ])
        tag = backend
    return f"{tag}-v2-{hashlib.sha256(key.encode()).hexdigest()[:12]}"


def _entry_features(path: str) -> frozenset[bytes] | None:
    """Target-feature strings embedded in a cache entry.

    Returns a frozenset of distinct feature strings (empty if none — such
    entries carry no machine code and are load-safe), or None if the entry
    is corrupt / undecompressable (treated as dangerous by the caller).
    Stream-decompresses in chunks with an overlap window so memory stays
    O(chunk) even for multi-hundred-MB entries.
    """
    found: set[bytes] = set()
    overlap = 16384  # > max observed feature-string length (~2 KB)
    try:
        with open(path, "rb") as f:
            head = f.read(4)
            f.seek(0)
            if head == _ZSTD_MAGIC:
                try:
                    import zstandard
                except ImportError:
                    # cannot inspect a compressed entry: treat as dangerous
                    # (recompiling is always safe; loading a wrong-target
                    # artifact is not)
                    return None
                reader = zstandard.ZstdDecompressor().stream_reader(f)
            else:
                reader = f
            tail = b""
            while True:
                chunk = reader.read(1 << 20)
                if not chunk:
                    break
                buf = tail + chunk
                found.update(_FEAT_RE.findall(buf))
                tail = buf[-overlap:]
    except Exception:
        return None
    return frozenset(found)


def _witness_main():  # pragma: no cover - runs in a subprocess
    """Subprocess entry: compile a canary, print its embedded features.

    Runs in a clean CPU-pinned process (jax cache writes flush on a
    background thread that reads the *current* config, so extracting the
    witness in-process races with the real cache configuration). Prints one
    hex-encoded feature string per line, or WITNESS_NONE.
    """
    import time

    import jax
    import jax.numpy as jnp

    tmp = tempfile.mkdtemp(prefix="ptpu-cache-witness-")
    jax.config.update("jax_compilation_cache_dir", tmp)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    def canary(x):
        def body(i, c):
            return jnp.sin(c * 1.0001) + jnp.float32(i)

        return jax.lax.fori_loop(0, 4, body, x * 2.0 + 1.0)

    x = jnp.zeros((64,), jnp.float32)
    jax.jit(canary)(x).block_until_ready()
    feats: set[bytes] = set()
    deadline = time.monotonic() + 5.0
    while True:
        for name in os.listdir(tmp):
            fs = _entry_features(os.path.join(tmp, name))
            if fs:
                feats.update(fs)
        if feats or time.monotonic() > deadline:
            break
        time.sleep(0.1)
    if feats:
        for f in sorted(feats):
            print("WITNESS_FEAT " + f.hex())
    else:
        print("WITNESS_NONE")


def _witness_cache_file() -> str:
    """Witness results are per (host CPU, jaxlib, XLA_FLAGS) — cache them so
    the subprocess runs once per host configuration, ever."""
    import jax
    import jaxlib

    key = "\n".join([
        f"jax={jax.__version__};jaxlib={jaxlib.__version__}",
        _stable_cpuinfo(),
        "XLA_FLAGS=" + os.environ.get("XLA_FLAGS", ""),
    ])
    root = os.environ.get("PLATINUM_TPU_CACHE_DIR", _DEFAULT)
    return os.path.join(
        root, f".witness-v2-{hashlib.sha256(key.encode()).hexdigest()[:12]}")


def _witness_features() -> frozenset[bytes] | None:
    """The target-feature string THIS host's XLA:CPU backend stamps into
    serialized executables — by construction the one its loader accepts, so
    it is the ground truth to validate foreign cache entries against.

    Obtained from a CPU-pinned subprocess (valid for any parent backend:
    LLVM host detection doesn't depend on which jax platform is active) and
    cached per host configuration. Returns None if no witness is available
    (canary embedded no features, or the subprocess failed).
    """
    cache_file = _witness_cache_file()
    try:
        with open(cache_file) as f:
            lines = f.read().split()
        if lines == ["NONE"]:
            return None
        if lines:
            return frozenset(bytes.fromhex(ln) for ln in lines)
    except (OSError, ValueError):
        pass

    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_PLATFORM_NAME", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never dial the TPU relay
    env["PLATINUM_TPU_NO_CACHE"] = "1"
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "from platinum_tpu.utils.cache import _witness_main; "
             "_witness_main()"],
            env=env, capture_output=True, text=True, timeout=180,
        )
    except Exception:
        return None
    feats: set[bytes] = set()
    none_seen = False
    for ln in proc.stdout.splitlines():
        if ln.startswith("WITNESS_FEAT "):
            try:
                feats.add(bytes.fromhex(ln.split(" ", 1)[1]))
            except ValueError:
                pass
        elif ln.strip() == "WITNESS_NONE":
            none_seen = True
    if not feats and not none_seen:
        return None  # subprocess failed: don't cache, retry next time
    try:
        os.makedirs(os.path.dirname(cache_file), exist_ok=True)
        tmp = cache_file + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            f.write("\n".join(sorted(x.hex() for x in feats)) or "NONE")
        os.replace(tmp, cache_file)
    except OSError:
        pass
    return frozenset(feats) if feats else None


def _scan_and_quarantine(path: str) -> None:
    """Validate every unscanned entry in `path`; quarantine incompatible ones.

    Stamp file `.scanned.json` maps entry name -> (size, mtime) for entries
    already validated, so repeated enables only pay for new files. Entries
    with embedded target features that differ from the witness — or from the
    directory consensus when no witness is available — are moved into
    `.quarantine/` where jax will never load them.
    """
    try:
        names = [n for n in os.listdir(path)
                 if not n.startswith(".") and
                 os.path.isfile(os.path.join(path, n))]
    except OSError:
        return
    stamp_path = os.path.join(path, ".scanned.json")
    try:
        with open(stamp_path) as f:
            stamp = json.load(f)
    except Exception:
        stamp = {}

    def sig(p):
        st = os.stat(p)
        return [st.st_size, int(st.st_mtime)]

    fresh = []
    for n in names:
        p = os.path.join(path, n)
        try:
            if stamp.get(n) != sig(p):
                fresh.append(n)
        except OSError:
            continue
    if not fresh:
        return

    feats_by_name: dict[str, frozenset[bytes] | None] = {
        n: _entry_features(os.path.join(path, n)) for n in fresh
    }
    bearing = {n: fs for n, fs in feats_by_name.items() if fs}
    witness = _witness_features() if bearing else None

    qdir = os.path.join(path, ".quarantine")
    bad: list[str] = []
    for n, fs in feats_by_name.items():
        if fs is None:
            bad.append(n)  # corrupt / unreadable: never let jax load it
        elif fs and witness is not None and fs != witness:
            bad.append(n)
    if witness is None and bearing:
        # No witness available (the subprocess timed out / failed, or this
        # process serializes HLO-only entries). Feature-bearing entries
        # cannot be proven self-compiled without a witness — a self-
        # consistent FOREIGN set would pass a consensus check and still
        # crash at load. Quarantine all of them; recompiling is always
        # safe, loading a wrong-target artifact is not.
        print("# platinum_tpu cache: no witness available; quarantining "
              f"{len(bearing)} uninspectable feature-bearing entries",
              flush=True)
        bad.extend(n for n in bearing if n not in bad)

    for n in bad:
        try:
            os.makedirs(qdir, exist_ok=True)
            os.replace(os.path.join(path, n), os.path.join(qdir, n))
            print(f"# platinum_tpu cache: quarantined incompatible entry {n}",
                  flush=True)
        except OSError:
            try:
                os.remove(os.path.join(path, n))
            except OSError:
                pass

    for n in fresh:
        if n in bad:
            stamp.pop(n, None)
            continue
        try:
            stamp[n] = sig(os.path.join(path, n))
        except OSError:
            pass
    try:
        tmp = stamp_path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(stamp, f)
        os.replace(tmp, stamp_path)
    except OSError:
        pass


def enable_compilation_cache():
    global _done
    if _done or os.environ.get("PLATINUM_TPU_NO_CACHE") == "1":
        return
    import jax

    path = os.path.join(
        os.environ.get("PLATINUM_TPU_CACHE_DIR", _DEFAULT), _scope_name()
    )
    os.makedirs(path, exist_ok=True)
    if os.environ.get("PLATINUM_TPU_CACHE_UNSAFE") != "1":
        _scan_and_quarantine(path)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _done = True
