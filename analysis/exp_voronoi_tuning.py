"""Voronoi sweep/iteration tuning experiments at 442k (warm caches).

Times, with warmup excluded:
  * the 12-direction J pass at the given lambda chunk,
  * one full NLTE iteration body (damping -> J w/ profiles -> S -> rates),
broken into sub-phases.  Used to pick production chunk sizes and verify
levers before the 3.5M headline bench.

Usage: python analysis/exp_voronoi_tuning.py [--n-sites N] [--chunk B]
       [--order wavefront] [--reps 2]
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
    ap.add_argument("--chunk", type=int, default=91)
    ap.add_argument("--order", default="wavefront")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--atmos", type=int, nargs=3, default=(192, 128, 128))
    ap.add_argument("--seed", type=int, default=2022)
    args = ap.parse_args()

    cache = os.path.join(_ROOT, ".cache", "jax")
    from voronoirt_tpu.platform import setup
    setup(platform=os.environ.get("VRT_PLATFORM") or None, x64=False,
          cache_dir=cache)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from voronoirt_tpu import Config, synthetic_atmosphere
    from voronoirt_tpu.engine import VoronoiEngine
    from voronoirt_tpu.engine.lambda_iter import (_update_S,
                                                  _rates_and_populations)
    from voronoirt_tpu.grid import build_sites, initialise_sites
    from voronoirt_tpu.grid.cache import default_cache_dir
    from voronoirt_tpu.grid.sampling import sample_sites
    from voronoirt_tpu.physics import lyman_alpha_line

    t_setup = time.time()
    nz, nx, ny = args.atmos
    atmos = synthetic_atmosphere(nz=nz, nx=nx, ny=ny, seed=5)
    pos = sample_sites(atmos, args.n_sites, density="invNH_invT",
                       seed=args.seed)
    bounds = (atmos.z[0], atmos.z[-1], atmos.x[0], atmos.x[-1],
              atmos.y[0], atmos.y[-1])
    sites = build_sites(pos, bounds, initialise_sites(pos, atmos),
                        cache_dir=default_cache_dir())
    cfg = Config(quadrature="ul7n12", lambda_chunk=args.chunk,
                 maxiter=1, voronoi_order=args.order,
                 cache_dir=default_cache_dir())
    line = lyman_alpha_line(cfg.nlam_bb, cfg.nlam_bf,
                            jnp.asarray(sites.temperature))
    eng = VoronoiEngine(sites, line, cfg)
    print(f"setup {time.time()-t_setup:.1f}s", flush=True)

    def sync(x):
        return float(jnp.sum(x))

    def iteration():
        t0 = time.time()
        pops = eng.lte
        damping_lam = eng.damping_lam(pops)
        sync(damping_lam)
        t1 = time.time()
        J = eng.compute_J(eng.B0, pops, damping_lam)
        sync(J)
        t2 = time.time()
        S_new = _update_S(line, eng.eps, J, eng.B0)
        pops_new = _rates_and_populations(line, J, damping_lam, eng.lte,
                                          eng.C, eng.T, eng.nH,
                                          cfg.compat)
        sync(S_new), sync(pops_new)
        t3 = time.time()
        return dict(damping=t1 - t0, J=t2 - t1, rates=t3 - t2,
                    total=t3 - t0)

    t0 = time.time()
    warm = iteration()
    print(f"iteration compile+first: {json.dumps(warm)} "
          f"({time.time()-t0:.1f}s)", flush=True)
    times = [iteration() for _ in range(args.reps)]
    best = min(t["total"] for t in times)
    out = {"n_sites": sites.n, "chunk": args.chunk,
           "order": args.order,
           "iteration_phases_warm": times[-1],
           "iteration_s_best": best,
           "iteration_throughput_pts_rays_per_s":
               sites.n * 12 * line.n_lambda / best}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
