"""Persistent XLA compilation cache setup.

Prod-shape programs compile slowly on TPU (replicate-pad convolutions
alone cost minutes — see ROADMAP.md); a persistent on-disk cache makes
every run after the first start in seconds. Opt-out via
PHT_NO_COMPILATION_CACHE=1; relocate via PHT_COMPILATION_CACHE_DIR.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    """Point JAX at a persistent on-disk compilation cache (idempotent)."""
    if os.environ.get("PHT_NO_COMPILATION_CACHE"):
        return
    import jax

    cache_dir = os.environ.get(
        "PHT_COMPILATION_CACHE_DIR",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "pht_tpu_jax_cache",
        ),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
