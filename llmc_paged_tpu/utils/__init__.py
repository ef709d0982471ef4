"""Shared utilities."""


def enable_compile_cache():
    """Persistent XLA compilation cache (~/.cache/llmc_paged_tpu/xla):
    the unrolled layer loop trades runtime for compile time (kv/layouts.py
    PagePool rationale), so cache compiled programs across processes.
    Opt out with LLMC_NO_COMPILE_CACHE=1."""
    import os as _os
    if _os.environ.get("LLMC_NO_COMPILE_CACHE"):
        return
    import jax as _jax
    d = _os.path.expanduser("~/.cache/llmc_paged_tpu/xla")
    _os.makedirs(d, exist_ok=True)
    try:
        _jax.config.update("jax_compilation_cache_dir", d)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
