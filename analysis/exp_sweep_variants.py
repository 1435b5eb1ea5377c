"""Isolate where the Voronoi J-pass time goes, on real 442k plans.

Variants of the 12-direction J pass (random S/alpha, B lanes):
  full        the production sweep
  no_relax    relax stages skipped entirely (exact/gs stages only)
  one_lap     relax stages run exactly one lap (repeats forced 1)
  no_exp      linear_weights replaced by (aw,bw,ew)=(0,0,1) -- no
              transcendentals, same gathers/FMA/DUS structure
Differences between adjacent variants attribute the time.

Usage: python analysis/exp_sweep_variants.py [--n-sites N] [--B 96]
"""

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-sites", type=int, default=442368)
    ap.add_argument("--B", type=int, default=96)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--atmos", type=int, nargs=3, default=(192, 128, 128))
    args = ap.parse_args()

    cache = os.path.join(_ROOT, ".cache", "jax")
    from voronoirt_tpu.platform import setup
    setup(platform=os.environ.get("VRT_PLATFORM") or None, x64=False,
          cache_dir=cache)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial
    from voronoirt_tpu import synthetic_atmosphere
    from voronoirt_tpu.grid import (build_sites, initialise_sites,
                                    build_voronoi_plan)
    from voronoirt_tpu.grid.cache import default_cache_dir
    from voronoirt_tpu.grid.sampling import sample_sites
    from voronoirt_tpu.quadrature import get_quadrature
    from voronoirt_tpu.solvers import sweep_voronoi as sv

    nz, nx, ny = args.atmos
    atmos = synthetic_atmosphere(nz=nz, nx=nx, ny=ny, seed=5)
    pos = sample_sites(atmos, args.n_sites, density="invNH_invT",
                       seed=2022)
    bounds = (atmos.z[0], atmos.z[-1], atmos.x[0], atmos.x[-1],
              atmos.y[0], atmos.y[-1])
    sites = build_sites(pos, bounds, initialise_sites(pos, atmos),
                        cache_dir=default_cache_dir())
    quad = get_quadrature("ul7n12")
    plans = [build_voronoi_plan(sites, np.asarray(quad.k[i]),
                                up=bool(quad.is_up[i]), order="wavefront",
                                cache_dir=default_cache_dir())
             for i in range(12)]
    sv.share_plan_shapes(plans, 3)

    B = args.B
    rng = np.random.default_rng(0)
    S = jnp.asarray(rng.uniform(0.1, 1.0, (B, sites.n)), jnp.float32)
    alpha = jnp.asarray(10.0 ** rng.uniform(-9, -5, (B, sites.n)),
                        jnp.float32)

    real_lw = sv.linear_weights

    def fake_lw(dtau):
        one = jnp.ones_like(dtau)
        return jnp.zeros_like(dtau), jnp.zeros_like(dtau), one

    def J_pass(drop_relax=False, one_lap=False):
        J = jnp.zeros_like(S)
        for plan in plans:
            sp = sv.build_slot_plan(plan, 3)
            shapes = tuple((st.kind, st.W, st.passes) for st in sp.stages)
            stage_arrays, slot_gather, site_gather = sv._device_arrays(sp)
            if drop_relax:
                keep = [j for j, s in enumerate(shapes)
                        if s[0] != "relax"]
                shapes = tuple(shapes[j] for j in keep)
                stage_arrays = tuple(stage_arrays[j] for j in keep)
            elif one_lap:
                stage_arrays = tuple(
                    (tuple(x[:-1]) + (jnp.ones((), jnp.int32),))
                    for x in (tuple(xs) for xs in stage_arrays))
            I0 = jnp.ones((B, sp.n_bc), S.dtype)
            I = sv._sweep_slots(shapes, 0.0 if one_lap or drop_relax
                                else 1e-7, stage_arrays, slot_gather,
                                site_gather, S, alpha, I0)
            J = J + 0.08333 * I
        return float(jnp.sum(J))

    out = {"n_sites": sites.n, "B": B}
    for name, kw in (("full", {}),
                     ("one_lap", {"one_lap": True}),
                     ("no_relax", {"drop_relax": True})):
        _ = J_pass(**kw)
        t0 = time.time()
        for _ in range(args.reps):
            _ = J_pass(**kw)
        out[name + "_s"] = (time.time() - t0) / args.reps
        print(name, out[name + "_s"], flush=True)

    # no_exp: monkeypatch linear_weights, fresh jit cache entry needed
    sv.linear_weights = fake_lw
    try:
        jax.clear_caches()
        _ = J_pass()
        t0 = time.time()
        for _ in range(args.reps):
            _ = J_pass()
        out["no_exp_s"] = (time.time() - t0) / args.reps
        print("no_exp", out["no_exp_s"], flush=True)
    finally:
        sv.linear_weights = real_lw
        jax.clear_caches()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
