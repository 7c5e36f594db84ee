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
        # Keep the default min entry size (avoids unbounded growth from
        # many tiny entries) and bound the cache so LRU eviction stays on.
        try:
            jax.config.update("jax_compilation_cache_max_size", 4 << 30)
        except Exception:
            pass  # flag absent on older JAX; default behavior is fine
    except Exception as exc:
        # cache is an optimization; never fail an entry point over it —
        # but don't hide misconfiguration (unwritable dir, unknown flag).
        import warnings
        warnings.warn(f"rain_tpu: persistent compile cache disabled: {exc!r}")
