"""Formal-solution throughput benchmark (the do_timing analog).

Workload: full ul7n12 quadrature (12 statically planned sweeps) over a
Bifrost-like regular grid with a 16-wavelength batch (a realistic
per-chip lambda chunk of the 91-point production grid), iterated as a
Lambda-style dependency chain S <- 0.95 S + 0.05 J so repeated passes
can neither be CSE'd nor overlapped incorrectly.  Mirrors
src/compare_searchlight.jl:358-490 `do_timing` (12 angles x 1 lambda on
the half-res 215x256x256 snapshot) scaled by the lambda batch.

Timing: K passes inside one jitted call, one scalar host readback; the
tunnel round-trip (measured with a null readback) is subtracted.

Metric: grid-points * rays / second / chip, rays = angles x wavelengths.

vs_baseline: ratio to the reference's best recorded throughput.  The
only published numbers are full-NLTE wall time vs thread count
(python/plot_threads_time.py: 6175 s @ 1 thread, 2330 s @ 10 threads).
The production workload is 12 angles x 91 lambda x 3.52e6 points per
iteration; assuming ~50 Lambda iterations per run, the 10-thread
throughput is 50*12*91*3.52e6/2330 = 8.2e7 grid-points*rays/s
(see BASELINE.md).  That derived ratio is kept for round-over-round
continuity; since round 3 a MEASURED restatement exists alongside:
analysis/bench_iteration_reference_shape.py times one full Lambda
iteration at the reference production shape (215x256x256, 91 lambda,
ul7n12) on chip -- 16.4 s vs the reference's derived 46.6 s/iteration
-- and its artifact (artifacts/BENCH_ITERATION.json) is surfaced here
as vs_baseline_measured_iteration when present.
"""

import json
import time

REF_THROUGHPUT = 8.2e7  # grid-points*rays/s, reference @ 10 threads


def main(small=False):
    import jax

    try:
        import os
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".cache", "jax")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np
    from voronoirt_tpu.quadrature import get_quadrature
    from voronoirt_tpu.solvers.sweep_regular import (
        build_plan, sweep, group_plans, sweep_group_J)

    if small:
        nz, nx, ny, nlam, K = 48, 64, 64, 4, 2
    else:
        nz, nx, ny, nlam, K = 192, 256, 256, 16, 3

    # Bifrost-like geometry: dz ~ dx/2 (half-res snapshot proportions)
    dx = 62.5e3
    z = np.arange(nz) * (dx / 2)
    quad = get_quadrature("ul7n12")

    rng = np.random.default_rng(0)
    dtype = jnp.float32
    S0 = jnp.asarray(rng.uniform(0.1, 1.0, (nz, nlam, nx, ny)), dtype)
    alpha = jnp.asarray(10.0 ** rng.uniform(-9, -5, (nz, nlam, nx, ny)),
                        dtype)
    I0 = jnp.asarray(rng.uniform(0.5, 1.0, (nlam, nx, ny)), dtype)

    plans = [build_plan(quad.k[i], z, dx, dx, bool(quad.is_up[i]))
             for i in range(quad.n_angles)]
    # mirror-quadrant angles batch into one sweep each (the marching
    # kernels are latency-bound; a pair costs ~one sweep)
    groups = group_plans(quad.k, quad.is_up, z, dx, dx)
    w = [float(v) for v in quad.weights]

    def J_pass(S):
        # sweep_group_J keeps each group's flip/stack/sweep inside one
        # jit, so per-group working sets (3.2 GB stacks at 4-angle
        # groups) are XLA temporaries allocated at execution -- eagerly
        # chaining the groups never holds more than one set.
        J = jnp.zeros_like(S)
        for g in groups:
            if len(g) == 1:
                (i, _, _) = g[0]
                J = J + w[i] * sweep(plans[i], S, alpha, I0, n_sweeps=3)
                continue
            J = J + sweep_group_J(
                tuple(p for (_, p, _) in g), S,
                tuple(alpha for _ in g), tuple(I0 for _ in g),
                jnp.asarray([w[i] for (i, _, _) in g], S.dtype),
                n_sweeps=3, flips=tuple(f for (_, _, f) in g))
        return J

    mix = jax.jit(lambda S, J: 0.95 * S + 0.05 * J)
    total = jax.jit(lambda S: jnp.sum(S))

    def chained(S):
        # async dispatch of K dependency-chained passes; a single scalar
        # readback at the end synchronizes the whole chain (per-call
        # block_until_ready does not synchronize through the tunnel).
        for _ in range(K):
            J = J_pass(S)
            S = mix(S, J)
        return float(total(S))

    # round-trip latency of a null readback
    null = jax.jit(lambda x: x + 1.0)
    _ = float(null(1.0))
    t0 = time.time()
    for _ in range(5):
        _ = float(null(1.0))
    rtt = (time.time() - t0) / 5

    # warmup/compile
    t0 = time.time()
    _ = chained(S0)
    compile_s = time.time() - t0

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        _ = chained(S0)
    dt = max((time.time() - t0) / reps - rtt, 1e-9) / K

    pts_rays = nz * nx * ny * quad.n_angles * nlam
    throughput = pts_rays / dt
    result = {
        "metric": "grid-points*rays/s/chip (formal solution, 12 angles)",
        "value": throughput,
        "unit": "pts*rays/s",
        "vs_baseline": throughput / REF_THROUGHPUT,
        "grid": [nz, nx, ny], "nlam": nlam,
        "seconds_per_J_pass": dt,
        "rtt_seconds": rtt,
        "compile_seconds": compile_s,
        "device": str(jax.devices()[0]),
    }
    try:
        import os
        it = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "artifacts", "BENCH_ITERATION.json")
        with open(it) as f:
            rec = json.load(f)
        result["measured_iteration_seconds"] = \
            rec["iteration_seconds_measured"]
        result["vs_baseline_measured_iteration"] = \
            rec["vs_baseline_measured_iteration"]
    except Exception:
        pass
    try:
        import os
        vf = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_VORONOI.json")
        with open(vf) as f:
            rec = json.load(f)
        result["voronoi_production_sites"] = rec["n_sites"]
        result["voronoi_sweep_sites_rays_per_s"] = \
            rec["sweep_throughput_sites_rays_per_s"]
        result["voronoi_iteration_seconds"] = \
            rec["phases"].get("nlte_iteration_s")
        it_s = rec["phases"].get("nlte_iteration_s")
        if it_s:
            # reference: 2330 s at 10 CPU threads / 50 assumed
            # iterations (no published count) = 46.6 s/iteration at
            # this exact configuration (3,522,560 sites, 91 lambda,
            # ul7n12) -- see BASELINE.md
            result["voronoi_vs_baseline_iteration"] = 46.6 / it_s
    except Exception:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    import sys
    main(small="--small" in sys.argv)
