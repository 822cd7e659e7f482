"""Persistent XLA compilation cache plumbing.

Flagship-scale programs cost minutes to compile (10-20 through a remote
transport), and every fresh process pays it again. JAX's persistent cache
keys compiled executables by (HLO, compile options, toolchain) hash and
re-loads them across processes — measured on the remote-TPU backend:
162.9 s first-process compile -> 19.5 s in the next process (the residue
is backend init, not compilation).

Call `enable_compile_cache()` early (before the first jit lowering) —
bench.py, `__graft_entry__`, and the TPU probe/experiment scripts do.
Override the location with JAX_COMPILATION_CACHE_DIR or disable with
PATCHIONER_COMPILE_CACHE=0.
"""

from __future__ import annotations

import os

DEFAULT_DIR = "/tmp/patchioner_xla_cache"


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently enable the persistent compilation cache. Returns the
    cache dir, or None when disabled/unavailable."""
    if os.environ.get("PATCHIONER_COMPILE_CACHE", "1") == "0":
        return None
    import jax

    path = (cache_dir
            or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took meaningful compile time; the default
        # threshold (1 s) already skips trivial programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:
        # never silent: a disabled cache means every process re-pays
        # multi-minute flagship compiles and looks exactly like a miss
        import sys

        print(
            f"warning: persistent compile cache disabled "
            f"({type(e).__name__}: {e}) — compiles will not be reused "
            f"across processes",
            file=sys.stderr,
        )
        return None
    return path
