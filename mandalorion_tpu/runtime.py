"""JAX runtime knobs shared by every device entry point.

The device compute path dispatches a bounded set of kernel shapes
(quantized width / query-depth / batch buckets in align/kernels.py,
align/chain_kernel.py, poa/kernels.py). Persisting their XLA compilations
to disk means a pipeline process only ever pays each compile once per
machine, not once per run — on a tunneled single-chip setup the compile
round trips otherwise dominate end-to-end wall time (BENCH_r02's 5.3
reads/s device path was mostly compilation).
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a durable directory
    (env MANDO_XLA_CACHE_DIR overrides; default ~/.cache/mandalorion_tpu).
    Idempotent; returns the directory, or None when the running JAX has no
    persistent-cache support. Set MANDO_XLA_CACHE_DIR=0 to disable."""
    global _ENABLED
    env = os.environ.get("MANDO_XLA_CACHE_DIR", "")
    if env == "0":
        return None
    cache_dir = cache_dir or env or os.path.join(
        os.path.expanduser("~"), ".cache", "mandalorion_tpu", "xla")
    if _ENABLED:
        return cache_dir
    import jax
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every kernel: the dispatch set is small and quantized, so
        # entry count stays bounded; even sub-second compiles add up
        # through the device tunnel
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except (AttributeError, ValueError, OSError):  # pragma: no cover
        return None
    _ENABLED = True
    return cache_dir


def fork_ok() -> bool:
    """True when forking a worker pool is safe: no live JAX backend (its
    XLA thread pools deadlock in forked children) and no other threads in
    this process (Python 3.12 warns on any multi-threaded fork). Merely
    having imported jax — which this image's sitecustomize does in every
    process — is fine. Pool sites use fork when this holds (cheap
    copy-on-write inheritance of big read-only state like the genome
    index) and fall back to spawn or serial otherwise."""
    import sys
    import threading
    if threading.active_count() > 1:
        return False
    if "jax" not in sys.modules:
        return True
    try:
        from jax._src import xla_bridge
        return not xla_bridge._backends
    except Exception:
        return False
