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


def distributed_init(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Join a multi-host run (the DCN mesh prerequisite).

    Call once per process before any computation; afterwards
    jax.devices() is the global device set and
    parallel.make_hybrid_mesh lays DCN axes across processes.  No-op
    when the environment provides no coordination info and no explicit
    arguments are given (single-host runs), and when already
    initialized.  On managed TPU pods jax.distributed.initialize
    autodetects everything from the metadata/env.
    """
    import os
    import warnings
    import jax

    # manual launch coordinates from the environment (see README
    # "Multi-host launch"): VRT_* take precedence, then the JAX names
    if coordinator_address is None:
        coordinator_address = (os.environ.get("VRT_COORDINATOR")
                               or os.environ.get("JAX_COORDINATOR_ADDRESS")
                               or os.environ.get("COORDINATOR_ADDRESS"))
    if num_processes is None and os.environ.get("VRT_NUM_PROCESSES"):
        num_processes = int(os.environ["VRT_NUM_PROCESSES"])
    if process_id is None and os.environ.get("VRT_PROCESS_ID"):
        process_id = int(os.environ["VRT_PROCESS_ID"])

    explicit = coordinator_address or num_processes or process_id is not None
    if not explicit:
        return  # single-host (TPU_WORKER_HOSTNAMES alone is not enough:
        # it is set on single-host TPU VMs too)
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        # backend already up (or already initialized): keep running
        # single-process rather than abort
        warnings.warn(f"distributed_init skipped: {e}")
