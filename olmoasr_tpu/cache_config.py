"""Persistent XLA compilation cache setup.

Remote-tunnel TPU compiles take minutes; caching compiled executables on disk
makes repeat invocations (bench, eval, transcribe CLI) start in seconds.
Importing this module (or calling enable()) is idempotent and safe on CPU.
"""

import os


def enable(cache_dir: str = None):
    import jax

    cache_dir = cache_dir or os.environ.get(
        "OLMOASR_COMPILE_CACHE", os.path.expanduser("~/.cache/olmoasr_xla")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: carry on uncached


enable()
