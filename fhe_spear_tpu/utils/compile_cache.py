"""Persistent XLA compilation cache (VERDICT r3 #7: cold-start kill).

The round-3 artifacts paid 526 s for token 0 and 1185 s for the first
bootstrap call — all XLA compilation of the big jitted kernels.  JAX's
persistent compilation cache serializes compiled executables to disk
keyed by (HLO, compile options, backend version); a warm process skips
straight to execution.  The reference has no analog (CUDA kernels are
AOT-compiled into the PhantomFHE binary — its "compile" cost is paid at
library build time; ours is paid once per cache fill).

Call enable_compilation_cache() BEFORE building contexts/kernels.  Env:
  FHE_COMPILE_CACHE      cache directory (default ~/.cache/fhe_spear_xla)
  FHE_COMPILE_CACHE=0    disable
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_DEFAULT = os.path.expanduser("~/.cache/fhe_spear_xla")


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at `path` (created if
    missing).  Returns the directory, or None when disabled via
    FHE_COMPILE_CACHE=0.  Safe to call more than once."""
    env = os.environ.get("FHE_COMPILE_CACHE")
    if env == "0":
        return None
    path = path or env or _DEFAULT
    os.makedirs(path, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything: the BSGS/NTT kernels are seconds-to-minutes of
    # compile each, but even sub-second helpers add up over a cold start
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # knob not present on older jax
    return path
