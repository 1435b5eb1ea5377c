"""Production-scale Voronoi benchmark: the paper's flagship configuration.

Matches the reference's production run shape (src/compare_line.jl:64-74:
3,522,560 sites sampled from invNH_invT ~ half-res regular equivalent,
91 wavelengths, 12-angle ul7n12 quadrature) and the do_timing harness
(src/compare_searchlight.jl:358-490), executed end-to-end on one chip:

  sample -> tessellate (native C++) -> plan all 12 directions ->
  12-angle x chunk-lambda formal J pass (throughput metric) ->
  one full NLTE Lambda iteration with lambda_chunk (memory proof).

Records a BENCH-style JSON artifact with per-phase seconds, sweep
throughput (sites*rays/s/chip), full-iteration wall time, and peak HBM.

Usage:
  python analysis/bench_voronoi_production.py [--n-sites N] [--chunk B]
      [--order wavefront|layer] [--out FILE] [--skip-iteration]

Default ordering is 'wavefront' (the exact upwind-DAG schedule):
the parity 'layer' mode truncates grazing beams (docs/PARITY.md item 2),
so wavefront is the production choice.  Since round 3 the 'layer'
exact-Gauss-Seidel scheduler is vectorized (grid/voronoi.py
_gs_layer_schedule) and builds 3.5e6-site plans in seconds, so
--order layer works at production scale too.
"""

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def mem_stats(probe=False):
    """probe=True is DESTRUCTIVE through the axon tunnel (a failed
    allocation permanently wedges the client -- measured,
    analysis/exp_hbm_strand.py): only pass it after the LAST device
    work of the process.  Round 4 probed between phases, which is
    exactly why everything after the probe OOM'd."""
    import jax
    out = {}
    try:
        s = jax.devices()[0].memory_stats() or {}
        out = {"bytes_in_use": s.get("bytes_in_use"),
               "peak_bytes_in_use": s.get("peak_bytes_in_use")}
    except Exception:
        pass
    if probe and out.get("bytes_in_use") is None:
        from voronoirt_tpu.observability.metrics import probe_free_hbm
        try:
            out["free_bytes_probed"] = probe_free_hbm()
        except Exception:
            out["free_bytes_probed"] = None
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-sites", type=int, default=3_522_560)
    ap.add_argument("--chunk", type=int, default=91,
                    help="lambda chunk through the sweeps.  91 (the "
                    "full production batch) rides the measured v5e "
                    "gather fast path (7.7 ns/row at >=364-byte rows "
                    "vs 14-37 ns below); with donated stage/lap "
                    "buffers, packed lean weights and fused damping "
                    "(round 5) the chunk-91 working set fits the "
                    "~15 GB usable HBM")
    ap.add_argument("--iter-chunk", type=int, default=91,
                    help="lambda chunk for the full-NLTE-iteration "
                    "phase (the iteration additionally holds B0, "
                    "S_old and the populations next to the sweep "
                    "working set; drop to 48/16 with --hoist-gb-iter 0 "
                    "if a new configuration overruns)")
    ap.add_argument("--hoist-gb-sweep", type=float, default=3.0,
                    help="relax-lap lean-weight hoist budget (GB) for "
                    "the sweep-throughput phase.  3.0 is the measured "
                    "ceiling at 3.5e6 sites x 91 lambda: 4.0 OOM'd "
                    "the sweep phase (artifacts/bench_voronoi_3.5M_"
                    "r5b.log) where 3.0 passed")
    ap.add_argument("--hoist-gb-iter", type=float, default=1.5,
                    help="hoist budget (GB) for the iteration phase "
                    "(its residents -- B0, S_T, J, populations -- "
                    "leave less slack than the sweep phase)")
    ap.add_argument("--nlam-bb", type=int, default=51)
    ap.add_argument("--nlam-bf", type=int, default=20)
    ap.add_argument("--order", default="wavefront",
                    choices=("wavefront", "layer"))
    ap.add_argument("--quadrature", default="ul7n12")
    ap.add_argument("--atmos", type=int, nargs=3, default=(192, 128, 128))
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-iteration", action="store_true")
    ap.add_argument("--skip-sweep", action="store_true",
                    help="skip the sweep-throughput phase (J-pass "
                    "timing) and go straight to the full iteration")
    ap.add_argument("--seed", type=int, default=2022)
    ap.add_argument("--rates-chunk", type=int, default=1 << 19,
                    help="site-slab size for the streamed rates/SE "
                    "update (engine _rates_and_populations_slabbed)")
    ap.add_argument("--no-cache", action="store_true",
                    help="disable the tessellation/plan disk cache "
                    "(cold-build timing runs)")
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
    from voronoirt_tpu.grid import build_sites, initialise_sites
    from voronoirt_tpu.grid.sampling import sample_sites
    from voronoirt_tpu.physics import lyman_alpha_line
    from voronoirt_tpu.physics.planck import B_lambda
    from voronoirt_tpu.solvers.sweep_voronoi import (build_slot_plan,
                                                     sweep_voronoi_t)

    rec = {"n_sites_requested": args.n_sites, "order": args.order,
           "chunk": args.chunk, "iter_chunk": args.iter_chunk,
           "quadrature": args.quadrature,
           "device": None, "phases": {}}

    nz, nx, ny = args.atmos
    atmos = synthetic_atmosphere(nz=nz, nx=nx, ny=ny, seed=5)

    t0 = time.time()
    pos = sample_sites(atmos, args.n_sites, density="invNH_invT",
                       seed=args.seed)
    rec["phases"]["sample_s"] = time.time() - t0

    from voronoirt_tpu.grid.cache import default_cache_dir
    cache_dir = None if args.no_cache else default_cache_dir()
    bounds = (atmos.z[0], atmos.z[-1], atmos.x[0], atmos.x[-1],
              atmos.y[0], atmos.y[-1])
    t0 = time.time()
    fields = initialise_sites(pos, atmos)
    sites = build_sites(pos, bounds, fields, cache_dir=cache_dir)
    rec["phases"]["tessellate_s"] = time.time() - t0
    rec["n_sites"] = sites.n
    rec["max_neighbours"] = int(sites.neighbours.shape[1] - 1)

    cfg = Config(quadrature=args.quadrature, nlam_bb=args.nlam_bb,
                 nlam_bf=args.nlam_bf, lambda_chunk=args.iter_chunk,
                 maxiter=1, voronoi_order=args.order,
                 cache_dir=cache_dir)
    line = lyman_alpha_line(cfg.nlam_bb, cfg.nlam_bf,
                            jnp.asarray(sites.temperature))
    # host plan construction timed SEPARATELY from the engine's device
    # physics setup: round 4's single conflated number (352 s "plan
    # build" at 442k) was dominated by frozen_setup's remote compiles,
    # not by the ~0.2 s/direction host plan build
    from voronoirt_tpu.quadrature import get_quadrature
    t0 = time.time()
    plans = VoronoiEngine.build_plans(sites, get_quadrature(
        args.quadrature), cfg)
    rec["phases"]["plan_build_12dir_s"] = time.time() - t0
    t0 = time.time()
    eng = VoronoiEngine(sites, line, cfg, plans=plans)
    rec["phases"]["engine_setup_s"] = time.time() - t0
    rec["device"] = str(jax.devices()[0])

    # slot-plan compile + device-geometry sizes (the memory-budget note)
    geom_bytes = 0
    n_slot_rows = []
    for plan in eng.plans:
        sp = build_slot_plan(plan, cfg.n_sweeps)
        n_slot_rows.append(sp.n_slots)
        for st in sp.stages:
            geom_bytes += st.up.size * 4 + st.w.size * 4 + st.r.size * 4
        geom_bytes += sp.slot_gather.size * 4 + sp.site_gather.size * 4
    rec["slot_rows_per_direction"] = n_slot_rows
    rec["plan_geometry_bytes_f32"] = int(geom_bytes)

    # ---------------- formal-solution throughput (do_timing analog)
    from voronoirt_tpu.observability.metrics import HbmLedger
    from voronoirt_tpu.solvers import sweep_voronoi as _sv
    led = HbmLedger()
    led.hold("plan_geometry+site_maps", nbytes=int(geom_bytes * 1.45))

    B = args.chunk
    rng = np.random.default_rng(0)
    S = jnp.asarray(rng.uniform(0.1, 1.0, (B, sites.n)), jnp.float32)
    alpha = jnp.asarray(10.0 ** rng.uniform(-9, -5, (B, sites.n)),
                        jnp.float32)
    quad = eng.quad

    from voronoirt_tpu.engine.lambda_iter import (_sync_interval, _drain,
                                                  _accum)
    sync_every = _sync_interval(4 * B * sites.n)
    # site-major operands: sweeps gather straight from (n, B) fields
    S = jnp.asarray(S.T)
    alpha = jnp.asarray(alpha.T)
    led.hold("S_T", S)
    led.hold("alpha_T", alpha)

    dir_seconds = []

    def J_pass(S_T, timed=False):
        J_T = jnp.zeros_like(S_T)
        for i in range(quad.n_angles):
            t0 = time.time()
            plan = eng.plans[i]
            if plan.up:
                I0 = jnp.ones((B, len(plan.bc_sites)), S_T.dtype)
            else:
                I0 = jnp.zeros((B, len(plan.bc_sites)), S_T.dtype)
            J_T = _accum(J_T, sweep_voronoi_t(
                plan, S_T, alpha, I0, n_sweeps=cfg.n_sweeps,
                relax_tol=cfg.voronoi_relax_tol),
                jnp.asarray(quad.weights[i], S_T.dtype))
            # drain enqueue-ahead output buffers (wide chunks OOM with
            # 12 x (n, B) sweep outputs allocated at dispatch)
            if (i + 1) % sync_every == 0:
                _drain(J_T)
            if timed:
                _drain(J_T)
                dir_seconds.append(round(time.time() - t0, 3))
        return J_T

    out = args.out or os.path.join(_ROOT, "BENCH_VORONOI.json")

    def save():
        # crash-resilient: persist after every phase (an OOM in a later
        # phase must not lose the measured ones)
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)

    save()
    K = 1

    @jax.jit
    def _mix(S, J):
        return 0.9 * S + 0.1 * J

    def chained(S):
        for _ in range(K):
            J = J_pass(S)
            S = _mix(S, J)
            del J
        return float(jnp.sum(S))

    if not args.skip_sweep:
        _sv._HOIST_BUDGET_BYTES = int(args.hoist_gb_sweep * (1 << 30))
        with led.phase("sweep_compile", transient_bytes=6 << 30):
            t0 = time.time()
            _ = chained(S)
            rec["phases"]["sweep_compile_s"] = time.time() - t0
        save()
        reps = 1
        with led.phase("sweep_timed", transient_bytes=6 << 30):
            t0 = time.time()
            for _ in range(reps):
                _ = chained(S)
            dt = (time.time() - t0) / reps / K
        # one per-direction timed pass (drain-per-angle adds RTTs, so
        # it is recorded separately from the throughput number)
        _ = J_pass(S, timed=True)
        rec["direction_seconds_timed_pass"] = dir_seconds[-12:]
        rec["seconds_per_J_pass_12dir"] = dt
        rec["sweep_throughput_sites_rays_per_s"] = (
            sites.n * quad.n_angles * B / dt)
        # scaled to the full 91-lambda production pass
        rec["projected_full_J_pass_s"] = dt * (line.n_lambda / B)
        # NON-destructive model: a failed allocation wedges the axon
        # client (exp_hbm_strand.py), so the bisection probe moved to
        # the very end of the process
        rec["memory_after_sweep"] = {"hbm_ledger": led.report()}
        save()
    # release the throughput-phase operands before the iteration
    del S, alpha
    led.drop("S_T", "alpha_T")

    # ---------------- one full NLTE iteration, lambda-chunked,
    # production-memory path (per-chunk damping + site-slabbed rates:
    # the 3.5e6-site iteration OOMs holding the full damping cube)
    if not args.skip_iteration:
        _sv._HOIST_BUDGET_BYTES = int(args.hoist_gb_iter * (1 << 30))
        from voronoirt_tpu.engine.lambda_iter import (
            _update_S, _gamma_cell, _rates_and_populations_slabbed)
        rates_chunk = args.rates_chunk

        def one_iteration():
            t0 = time.time()
            pops = eng.lte
            g_cell = _gamma_cell(line, eng.T,
                                 pops[..., 0] + pops[..., 1], eng.ne,
                                 cfg.gamma_natural)
            _ = float(jnp.sum(g_cell))        # tunnel sync per sub-phase
            t1 = time.time()
            J = eng.compute_J(eng.B0, pops, None)
            _ = float(jnp.sum(J))
            t2 = time.time()
            S_new = _update_S(line, eng.eps, J, eng.B0)
            pops_new = _rates_and_populations_slabbed(
                line, J, g_cell, eng.lte, eng.C, eng.T, eng.nH,
                cfg.compat, rates_chunk)
            # scalar readbacks synchronize through the tunnel
            s_sum = float(jnp.sum(S_new))
            p_sum = float(jnp.sum(pops_new))
            t3 = time.time()
            phases = {"damping_s": t1 - t0,
                      "J_s": t2 - t1,        # profiles+alpha+12x sweeps
                      "S_rates_populations_s": t3 - t2}
            return phases, t3 - t0, s_sum, p_sum

        # first call includes the iteration-shape compiles; the recorded
        # per-iteration number is the warm second call (a production run
        # compiles once and iterates ~dozens of times)
        _, cold, s_sum, p_sum = one_iteration()
        rec["phases"]["nlte_iteration_compile_s"] = cold
        rec["iteration_finite"] = bool(np.isfinite(s_sum)
                                       and np.isfinite(p_sum))
        save()
        phases, warm, s_sum, p_sum = one_iteration()
        rec["iteration_phases"] = phases
        rec["phases"]["nlte_iteration_s"] = warm
        rec["iteration_finite"] = bool(rec["iteration_finite"]
                                       and np.isfinite(s_sum)
                                       and np.isfinite(p_sum))
        rec["iteration_pts_rays"] = sites.n * quad.n_angles * line.n_lambda
        rec["iteration_throughput_pts_rays_per_s"] = (
            rec["iteration_pts_rays"] / rec["phases"]["nlte_iteration_s"])
        # end of all device work: the destructive probe is safe now
        rec["memory_after_iteration"] = mem_stats(probe=True)
        rec["hbm_ledger"] = led.report()

    out = args.out or os.path.join(_ROOT, "BENCH_VORONOI.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
