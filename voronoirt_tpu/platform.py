"""Runtime platform setup helpers.

jax may be preloaded by the environment with a TPU backend; env vars are
then too late, so platform/precision switches go through jax.config
(valid until the first computation initializes the backend).
"""

from __future__ import annotations


def setup(platform=None, x64=True, n_cpu_devices=None, cache_dir=None):
    """Configure jax before first use.

    Args:
      platform: "cpu" / "tpu" / None (keep default backend).
      x64: enable float64 (the physics layer needs f64 ranges; the
        transport kernels run float32 regardless).
      n_cpu_devices: virtual CPU device count (for mesh tests).
      cache_dir: persistent compilation cache directory.
    """
    import jax

    try:
        if n_cpu_devices:
            jax.config.update("jax_num_cpu_devices", int(n_cpu_devices))
        if platform:
            jax.config.update("jax_platforms", platform)
    except RuntimeError:
        pass  # backend already initialized
    jax.config.update("jax_enable_x64", bool(x64))
    if cache_dir:
        import os
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return jax.default_backend()
