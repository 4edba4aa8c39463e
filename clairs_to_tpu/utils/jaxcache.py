"""Persistent XLA compilation cache.

Fresh processes pay minutes of TPU compile for the full-size networks; the
persistent cache makes the second process start in seconds.  Called from
every entry point (CLI, bench, train tools)."""

import os


def enable_compilation_cache(cache_dir=None):
    import jax

    # The experimental 'axon' TPU plugin re-pins jax_platforms at import
    # time, silently overriding JAX_PLATFORMS; re-apply the user's choice
    # (subprocess workers — e.g. multi-host CPU tests — depend on this).
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass

    cache_dir = cache_dir or os.environ.get(
        "CLAIRS_TO_TPU_XLA_CACHE", "/root/.cache/clairs_to_tpu_xla"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass  # cache is an optimization; never fail a run over it
