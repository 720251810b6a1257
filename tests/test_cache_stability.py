"""Compile-cache key stability (tools/refresh_cache.py contract).

Pallas/Mosaic payloads embed call-stack source locations, so the
committed bench cache is only stable because bench.py sets
``jax_traceback_in_locations_limit = 0``.  These tests pin that
configuration and the line-shift-stability property it provides (for
the plain-XLA path, checkable on CPU; the Pallas case was verified on
the TPU backend and documented in bench.py)."""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_sets_location_limit():
    import jax
    sys.path.insert(0, REPO)
    import bench
    prev = jax.config.jax_traceback_in_locations_limit
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        bench._enable_compile_cache()
        assert jax.config.jax_traceback_in_locations_limit == 0
    finally:
        jax.config.update("jax_traceback_in_locations_limit", prev)
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)


def _key_for(tmpdir, pad):
    code = textwrap.dedent(f"""
        import sys
        import jax, jax.numpy as jnp
        jax.config.update("jax_traceback_in_locations_limit", 0)
        jax.config.update("jax_platforms", "cpu")
        src = "#\\n" * {pad} + (
            "import jax, jax.numpy as jnp\\n"
            "@jax.jit\\n"
            "def fn(x):\\n"
            "    return jnp.sin(x) @ jnp.cos(x.T) + 1.0\\n")
        open(r"{tmpdir}/m{pad}.py", "w").write(src)
        sys.path.insert(0, r"{tmpdir}")
        import importlib
        mod = importlib.import_module("m{pad}")
        import numpy as np
        lowered = mod.fn.lower(np.ones((8, 8), np.float32))
        import hashlib
        print(hashlib.sha256(
            lowered.compiler_ir().operation.get_asm(
                binary=True).__str__().encode()).hexdigest())
    """)
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    return out.stdout.strip().splitlines()[-1]


def test_line_shift_does_not_change_key(tmp_path):
    k0 = _key_for(str(tmp_path), 0)
    k7 = _key_for(str(tmp_path), 7)
    assert k0 == k7
