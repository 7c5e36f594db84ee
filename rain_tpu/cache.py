"""Persistent XLA compilation cache setup.

The reference pays a JIT cost once per process via torch cpp_extension
load (reference setup.py:1-18); our counterpart cost is XLA compilation
of the jitted step / Pallas kernels. Enabling JAX's persistent cache
makes every entry point (tests, bench, CLIs) pay it once per machine.
"""

import os


def enable_compile_cache(path: str | None = None) -> None:
    """Idempotently enable the persistent compilation cache."""
    import jax

    if path is None:
        path = os.environ.get(
            "RAIN_TPU_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "rain_tpu_xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail an entry point over it
