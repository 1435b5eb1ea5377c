"""Formal-solution throughput benchmark (the do_timing analog).

Workload: full ul7n12 quadrature (12 statically planned sweeps) over a
Bifrost-like regular grid with a wavelength batch, random extinction and
source fields (mirrors src/compare_searchlight.jl:358-490 `do_timing`,
which times 12 angles x 1 lambda on the half-res 215x256x256 snapshot).

Metric: grid-points * rays / second / chip, rays = angles x wavelengths
(every (point, angle, lambda) two-point formal-solution update counts
once) -- the north-star metric of BASELINE.md.

vs_baseline: ratio to the reference's best recorded throughput.  The
only published numbers are full-NLTE wall-clock vs thread count
(python/plot_threads_time.py: 6175 s @ 1 thread ... 2330 s @ 10
threads).  The production workload is 12 angles x 91 lambda x 3.52e6
grid points per iteration; assuming ~50 Lambda iterations for the run
(convergence histories in the paper), the 10-thread throughput is
    50 * 12 * 91 * 3.52e6 / 2330 s = 8.2e7 grid-points*rays/s.
That estimate is REF_THROUGHPUT below; see BASELINE.md.
"""

import json
import time

REF_THROUGHPUT = 8.2e7  # grid-points*rays/s, reference @ 10 threads


def main(small=False):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np
    from voronoirt_tpu.quadrature import get_quadrature
    from voronoirt_tpu.solvers.sweep_regular import build_plan, sweep

    if small:
        nz, nx, ny, nlam = 48, 64, 64, 2
    else:
        nz, nx, ny, nlam = 192, 256, 256, 4

    # Bifrost-like geometry: dz ~ dx/2 (half-res snapshot proportions)
    dx = 62.5e3
    z = np.arange(nz) * (dx / 2)
    quad = get_quadrature("ul7n12")

    rng = np.random.default_rng(0)
    dtype = jnp.float32
    S = jnp.asarray(rng.uniform(0.1, 1.0, (nz, nlam, nx, ny)), dtype)
    alpha = jnp.asarray(10.0 ** rng.uniform(-9, -5, (nz, nlam, nx, ny)),
                        dtype)
    I0 = jnp.asarray(rng.uniform(0.5, 1.0, (nlam, nx, ny)), dtype)

    plans = [build_plan(quad.k[i], z, dx, dx, bool(quad.is_up[i]))
             for i in range(quad.n_angles)]

    def J_pass():
        J = jnp.zeros_like(S)
        for i, plan in enumerate(plans):
            I = sweep(plan, S, alpha, I0, n_sweeps=3)
            J = J + quad.weights[i] * I
        return J

    # warmup (compile)
    t0 = time.time()
    J = J_pass()
    jax.block_until_ready(J)
    compile_and_first = time.time() - t0

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        J = J_pass()
    jax.block_until_ready(J)
    dt = (time.time() - t0) / reps

    pts_rays = nz * nx * ny * quad.n_angles * nlam
    throughput = pts_rays / dt
    result = {
        "metric": "grid-points*rays/s/chip (formal solution, 12 angles)",
        "value": throughput,
        "unit": "pts*rays/s",
        "vs_baseline": throughput / REF_THROUGHPUT,
        "grid": [nz, nx, ny], "nlam": nlam,
        "seconds_per_J_pass": dt,
        "first_pass_seconds": compile_and_first,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    import sys
    main(small="--small" in sys.argv)
