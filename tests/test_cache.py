"""Persistent-cache poisoning defense (utils/cache.py).

Round 3's suite crashed with an uncatchable native abort (rc=134) when jax
loaded an XLA:CPU AOT cache entry whose embedded LLVM target features (e.g.
+prefer-no-gather, a model/microcode-derived tuning attribute) didn't match
the running host — written by a fleet machine with identical /proc/cpuinfo
`flags` but different hardware. These tests exercise the two defense layers:
the stable-cpuinfo scope key and the enable-time entry scan that quarantines
incompatible or corrupt entries before jax can ever load them.

Run in a CPU subprocess: the witness canary needs the CPU backend and the
entry format under test is the one the CPU test subprocesses produce.
"""

import textwrap

from conftest import run_in_cpu_mesh


def test_scan_quarantines_poisoned_and_corrupt_entries(cpu_mesh_env):
    env = dict(cpu_mesh_env)
    env.pop("PLATINUM_TPU_NO_CACHE", None)
    out = run_in_cpu_mesh(textwrap.dedent("""
        import os, tempfile, glob
        os.environ["PLATINUM_TPU_NO_CACHE"] = "1"   # control enable manually
        import jax, jax.numpy as jnp
        import zstandard
        from platinum_tpu.utils import cache

        scope = tempfile.mkdtemp()

        # (a) a COMPATIBLE feature-bearing entry: compile a canary with the
        # cache pointed at the scope dir, written by THIS process
        jax.config.update("jax_compilation_cache_dir", scope)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        cpu = jax.local_devices(backend="cpu")[0]
        def fn(x):
            return jax.lax.fori_loop(
                0, 4, lambda i, c: jnp.sin(c * 1.0001) + i, x * 2.0 + 1.0)
        c = jax.jit(fn, device=cpu).lower(jnp.zeros((64,), jnp.float32))
        c = c.compile()
        jax.config.update("jax_compilation_cache_dir", None)

        import time
        good = None
        deadline = time.monotonic() + 5.0
        while good is None and time.monotonic() < deadline:
            for f in glob.glob(scope + "/*-cache"):
                if cache._entry_features(f):
                    good = f
                    break
            time.sleep(0.1)
        assert good is not None, "no feature-bearing canary entry written"

        # (b) a POISONED entry: same bytes with a mutated feature string
        raw = open(good, "rb").read()
        dec = zstandard.ZstdDecompressor().decompressobj().decompress(raw)
        assert b"+64bit," in dec
        mut = dec.replace(b"+64bit,", b"+64bit,+totally-fake-feat,")
        poisoned = os.path.join(scope, "jit_evil-" + "0" * 64 + "-cache")
        open(poisoned, "wb").write(zstandard.ZstdCompressor().compress(mut))

        # (c) a CORRUPT entry (truncated zstd frame)
        corrupt = os.path.join(scope, "jit_bad-" + "1" * 64 + "-cache")
        open(corrupt, "wb").write(b"\\x28\\xb5\\x2f\\xfdgarbage")

        n_before = len(glob.glob(scope + "/*-cache"))
        cache._scan_and_quarantine(scope)

        kept = sorted(os.path.basename(p)
                      for p in glob.glob(scope + "/*-cache"))
        quar = sorted(os.listdir(os.path.join(scope, ".quarantine")))
        assert os.path.basename(good) in kept, (kept, quar)
        assert os.path.basename(poisoned) in quar, (kept, quar)
        assert os.path.basename(corrupt) in quar, (kept, quar)

        # second scan is a no-op on already-validated entries (stamp file)
        cache._scan_and_quarantine(scope)
        assert sorted(os.path.basename(p)
                      for p in glob.glob(scope + "/*-cache")) == kept
        print("SCAN_OK", n_before, len(kept), len(quar))
    """), env, timeout=420)
    assert "SCAN_OK" in out


def test_enable_on_polluted_cache_dir_is_safe(cpu_mesh_env):
    """End-to-end: enable_compilation_cache over a polluted cache root must
    quarantine the bad entry and leave jax fully usable."""
    env = dict(cpu_mesh_env)
    env.pop("PLATINUM_TPU_NO_CACHE", None)
    out = run_in_cpu_mesh(textwrap.dedent("""
        import os, tempfile
        root = tempfile.mkdtemp()
        os.environ["PLATINUM_TPU_CACHE_DIR"] = root
        os.environ.pop("PLATINUM_TPU_NO_CACHE", None)
        import jax, jax.numpy as jnp
        from platinum_tpu.utils import cache

        # pre-pollute the scope dir this process will use
        scope = os.path.join(root, cache._scope_name())
        os.makedirs(scope, exist_ok=True)
        bad = os.path.join(scope, "jit_evil-" + "2" * 64 + "-cache")
        open(bad, "wb").write(b"\\x28\\xb5\\x2f\\xfdnot-a-frame")

        cache.enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == scope
        assert not os.path.exists(bad)
        assert os.path.exists(os.path.join(scope, ".quarantine",
                                           os.path.basename(bad)))

        # jax still fully usable with the cache enabled
        y = jax.jit(lambda x: (x * 2 + 1).sum())(jnp.arange(8.0))
        assert float(y) == 64.0
        print("ENABLE_OK")
    """), env, timeout=420)
    assert "ENABLE_OK" in out


def test_scope_key_separates_target_configs(cpu_mesh_env):
    """The scope name must change when anything feeding LLVM host detection
    or XLA codegen changes (jax versions, stable cpuinfo incl. microcode,
    XLA_FLAGS, platform env)."""
    out = run_in_cpu_mesh(textwrap.dedent("""
        import os
        os.environ["PLATINUM_TPU_NO_CACHE"] = "1"
        from platinum_tpu.utils import cache
        base = cache._scope_name()
        assert base == cache._scope_name()  # deterministic
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_cpu_max_isa=AVX2"
        changed = cache._scope_name()
        assert changed != base, (base, changed)

        # microcode / stepping lines are part of the fingerprint
        info = cache._stable_cpuinfo()
        assert "model" in info or "processor=" in info
        print("SCOPE_OK", base, changed)
    """), cpu_mesh_env, timeout=240)
    assert "SCOPE_OK" in out
