"""Measure ONE full Lambda iteration at the reference's production
workload shape (round-3 verdict ask #5).

Workload: regular grid at half-res Bifrost proportions 215x256x256
(~1.41e7 points), 12-angle ul7n12 quadrature, the full 91-wavelength
production line grid (51 bb + 2x20 bf), synthetic atmosphere --
the shape behind the reference's recorded wall times
(python/plot_threads_time.py: 2330 s at 10 threads for the full run;
src/compare_line.jl:10-18,64).

The measured phases are the reference's per-iteration body
(lambda_iteration.jl:155-190): J over 12 angles x 91 lambda ->
S = (1-eps) J + eps B -> radiative rates R -> statistical equilibrium ->
convergence criterion.  Checkpoint I/O is excluded (the reference's
HDF5 write is host-side and not part of the compute comparison).

Memory strategy (the full-shape fields are 5.13 GB each in f32, so only
two may be resident): J accumulates lambda-chunk-wise into a donated
preallocated buffer with per-chunk damping/alpha computed on the fly
(never a full damping_lam cube); S_old is the Planck field (iteration
1); S_new overwrites the J buffer once R is done.

Writes artifacts/BENCH_ITERATION.json:
  * measured seconds for one full iteration (and per phase),
  * iteration throughput pts*rays/s/chip,
  * vs_baseline_measured_iteration: the reference's derived 46.6
    s/iteration (2330 s / 50 assumed iterations -- the reference
    publishes no iteration count) over our measured time.  Our side is
    now a measurement; the 50-iteration assumption on the reference
    side is retained and stated (bench.py keeps the round-1 derived
    throughput ratio alongside for continuity).

Usage: python analysis/bench_iteration_reference_shape.py
       [--nz 215 --nx 256 --ny 256] [--chunk 4]
"""

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

REF_FULL_RUN_S = 2330.0      # 10 threads, python/plot_threads_time.py
REF_ASSUMED_ITERS = 50.0     # stated assumption (no published count)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nz", type=int, default=215)
    ap.add_argument("--nx", type=int, default=256)
    ap.add_argument("--ny", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--nlam-bb", type=int, default=51)
    ap.add_argument("--nlam-bf", type=int, default=20)
    ap.add_argument("--max-group", type=int, default=0,
                    help="cap on angles per batched mirror-group sweep "
                    "(0 = the engine's auto policy from the chunk size)")
    ap.add_argument("--stream", action="store_true", default=True,
                    help="lambda-streamed iteration (engine "
                    "stream_rates): no resident J / second S / Planck "
                    "cube -- 3 x 5.13 GB freed at this shape")
    ap.add_argument("--no-stream", dest="stream", action="store_false")
    ap.add_argument("--out", default=os.path.join(
        _ROOT, "artifacts", "BENCH_ITERATION.json"))
    args = ap.parse_args()

    cache = os.path.join(_ROOT, ".cache", "jax")
    from voronoirt_tpu.platform import setup
    setup(platform=os.environ.get("VRT_PLATFORM") or None, x64=False,
          cache_dir=cache)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial
    from voronoirt_tpu import Config, synthetic_atmosphere
    from voronoirt_tpu.engine.lambda_iter import (RegularEngine,
                                                  _alpha_tot,
                                                  _lambda_chunks)
    from voronoirt_tpu.physics import lyman_alpha_line
    from voronoirt_tpu.physics.atom import line_of_sight_velocity
    from voronoirt_tpu.physics.broadening import damping, gamma_constant
    from voronoirt_tpu.physics.planck import B_lambda
    from voronoirt_tpu.solvers.sweep_regular import sweep_group_J

    cfg = Config(nlam_bb=args.nlam_bb, nlam_bf=args.nlam_bf,
                 quadrature="ul7n12", lambda_chunk=args.chunk,
                 stream_rates=args.stream,
                 group_max_angles=args.max_group or None)
    atmos = synthetic_atmosphere(nz=args.nz, nx=args.nx, ny=args.ny,
                                 seed=5)
    line = lyman_alpha_line(cfg.nlam_bb, cfg.nlam_bf,
                            jnp.asarray(atmos.temperature))
    rec = {"grid": [args.nz, args.nx, args.ny],
           "n_lambda": line.n_lambda, "quadrature": "ul7n12",
           "lambda_chunk": args.chunk, "stream": bool(args.stream),
           "max_group": args.max_group, "phases": {}}

    t0 = time.time()
    eng = RegularEngine(atmos, line, cfg)
    # B0 doubles as S_old for iteration 1 (lambda_iteration.jl:146)
    rec["phases"]["setup_s"] = time.time() - t0
    rec["device"] = str(jax.devices()[0])

    if args.stream:
        # the production path: lambda-streamed iteration through the
        # ENGINE (J chunk -> rate accumulation -> in-place S update).
        # Phases interleave by design; the headline is the full
        # iteration wall time.  Iteration 1 = compile; iterations 2-3
        # are genuine warm Lambda iterations (state advances).
        S = eng.B0
        eng.B0 = None
        pops = eng.lte
        t0 = time.time()
        S, pops, diff = eng.iterate_streamed(S, pops)
        rec["phases"]["compile_plus_first_iteration_s"] = \
            time.time() - t0
        times = []
        for _ in range(2):
            t0 = time.time()
            S, pops, diff = eng.iterate_streamed(S, pops)
            times.append(time.time() - t0)
        t_iter = min(times)
        n_pts = args.nz * args.nx * args.ny
        rec["warm_iteration_seconds_all"] = times
        rec["iteration_seconds_measured"] = t_iter
        rec["criterion_diff"] = diff
        rec["pops_finite"] = bool(np.isfinite(float(jnp.sum(pops))))
        rec["pts_rays"] = n_pts * 12 * line.n_lambda
        rec["iteration_throughput_pts_rays_per_s"] = \
            rec["pts_rays"] / t_iter
        rec["reference"] = {
            "full_run_s_10threads": REF_FULL_RUN_S,
            "assumed_iterations": REF_ASSUMED_ITERS,
            "derived_s_per_iteration": REF_FULL_RUN_S / REF_ASSUMED_ITERS,
        }
        rec["vs_baseline_measured_iteration"] = (
            (REF_FULL_RUN_S / REF_ASSUMED_ITERS) / t_iter)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
        print(json.dumps(rec))
        return

    dtype = jnp.float32
    lam = jnp.asarray(line.lam)
    chunks = _lambda_chunks(line.n_lambda, args.chunk)
    quad = eng.quad
    pops = eng.lte

    # per-cell damping gamma (lambda-independent) once
    g_cell = gamma_constant(line, eng.T,
                            pops[..., 0] + pops[..., 1], eng.ne,
                            cfg.gamma_natural)
    S_old = eng.B0.astype(dtype)

    @partial(jax.jit, donate_argnums=0)
    def write_chunk(buf, chunk, start):
        return jax.lax.dynamic_update_slice(
            buf, chunk, (start,) + (0,) * (buf.ndim - 1))

    @partial(jax.jit, donate_argnums=0, static_argnames=("size",))
    def s_update_chunk(buf, S_old_c, eps, start, size):
        """One fused op: read the J chunk back out of the (donated)
        buffer, form S_new and the criterion partial max, write S_new
        in place.  One dispatch per chunk -- a chain of eager ops costs
        ~40 ms EACH through the tunnel and dominated the phase."""
        J_c = jax.lax.dynamic_slice(
            buf, (start,) + (0,) * (buf.ndim - 1),
            (size,) + buf.shape[1:])
        S_new = ((1.0 - eps)[None] * J_c + eps[None] * S_old_c).astype(
            buf.dtype)
        denom = jnp.where(S_new != 0.0, S_new, 1.0)
        m = jnp.max(jnp.abs(S_new - S_old_c) / jnp.abs(denom))
        buf = jax.lax.dynamic_update_slice(
            buf, S_new, (start,) + (0,) * (buf.ndim - 1))
        return buf, m

    @jax.jit
    def damping_chunk(lam_c):
        lam_b = lam_c.reshape((-1,) + (1,) * eng.T.ndim)
        return damping(g_cell[None], lam_b, line.dlamD[None]).astype(dtype)

    def J_chunk(S_c, lam_c):
        """One lambda chunk of J over all 12 angles (grouped sweeps,
        sweep_group_J keeps each group's stacks as execution-time XLA
        temporaries -- see the engine's _J_chunk_grouped).  NOT jitted
        as a whole: the single-module HLO exceeds the remote-compile
        tunnel's upload limit (HTTP 413), so the chunk stays a handful
        of jitted dispatches (damping, per-angle alpha, one sweep per
        group)."""
        damp_c = damping_chunk(lam_c)
        S_t = jnp.swapaxes(S_c, 0, 1)
        Jc = jnp.zeros_like(S_t)
        for group in eng.plan_groups:
            a_list, I0_list = [], []
            for (i, plan_c, (fx, fy, fz)) in group:
                k = quad.k[i]
                v_los = line_of_sight_velocity(eng.v, -k)
                a_tot = _alpha_tot(line, lam_c, damp_c, v_los, pops,
                                   eng.a_cont).astype(dtype)
                a_list.append(jnp.swapaxes(a_tot, 0, 1))
                if not fz:
                    I0 = B_lambda(lam_c[:, None, None],
                                  eng.T[0][None]).astype(dtype)
                else:
                    I0 = jnp.zeros_like(S_c[:, 0])
                I0_list.append(I0)
            Jc = Jc + sweep_group_J(
                tuple(p for (_, p, _) in group), S_t,
                tuple(a_list), tuple(I0_list),
                jnp.asarray([quad.weights[i] for (i, _, _) in group],
                            dtype),
                n_sweeps=cfg.n_sweeps,
                flips=tuple(f for (_, _, f) in group))
            # backpressure between groups: at wide chunks every group's
            # extinction stack + output would otherwise be in flight at
            # once (4 * chunk-field bytes per group)
            if 4 * S_c.size * len(group) > (1 << 30):
                float(Jc[(0,) * Jc.ndim])
        return jnp.swapaxes(Jc, 0, 1)

    # rates need damping over the bb window; recompute it INSIDE the jit
    # so the fusion with the lambda-trapezoid reduction never
    # materializes a full (nlam, nz, nx, ny) damping cube
    @partial(jax.jit, static_argnames=("line_", "compat"))
    def rates_fused(line_, J, g_cell, lte, C, T, nH, compat):
        lam_b = jnp.asarray(line_.lam).reshape((-1,) + (1,) * T.ndim)
        damp = damping(g_cell[None], lam_b, line_.dlamD[None])
        from voronoirt_tpu.physics.stateq import get_revised_populations
        from voronoirt_tpu.physics.rates import calculate_R
        R = calculate_R(line_, J, damp, lte, T, compat=compat)
        return get_revised_populations(R, C, nH)

    # the rate integrals are pointwise in space: stream z-slabs so the
    # (nlam_bb, ...) Voigt/sigma/integrand temporaries stay bounded next
    # to the two resident 5.13 GB fields.  line carries the per-cell
    # Doppler width, so slab-sliced line objects are built once up front
    # (identity-hashed statics; equal-shape slabs hit the same persistent
    # cache entry).
    import dataclasses as _dc
    slab = max(1, args.nz // 16)
    slabs = [slice(z0, min(z0 + slab, args.nz))
             for z0 in range(0, args.nz, slab)]
    slab_lines = [_dc.replace(line, dlamD=line.dlamD[sl]) for sl in slabs]

    def _rates(J, sync):
        outs = []
        for e, (sl, line_s) in enumerate(zip(slabs, slab_lines)):
            outs.append(rates_fused(
                line_s, J[:, sl], g_cell[sl], eng.lte[sl],
                {kk: v[sl] for kk, v in eng.C.items()},
                eng.T[sl], eng.nH[sl], cfg.compat))
            if e % 4 == 3:
                sync(outs[-1])     # bound in-flight J slab slices
        return jnp.concatenate(outs, axis=0)

    def sync(x):
        # scalar host readback: block_until_ready does not synchronize
        # through the axon tunnel.  Also the backpressure mechanism: the
        # TPU stream executes in enqueue order, so a readback drains
        # every pending chunk's eager intermediates -- without it the
        # host runs ahead, all 23 chunks' group stacks are live at once
        # and the chip OOMs (2 x 5.13 GB fields leave ~5 GB headroom).
        float(jnp.sum(x[(0,) * (x.ndim - 1)][:1]))  # 1-elem slice, no
        # ravel: a reshape of a 5 GB buffer may materialize a copy

    # ---- warmup (compile everything once)
    t0 = time.time()
    J = jnp.zeros(S_old.shape, dtype)
    sl = chunks[0]
    Jc = J_chunk(S_old[sl], lam[sl])
    J = write_chunk(J, Jc, sl.start)
    sync(J)
    if len(chunks) > 1 and chunks[-1].stop - chunks[-1].start != \
            chunks[0].stop - chunks[0].start:
        sl = chunks[-1]
        Jc = J_chunk(S_old[sl], lam[sl])
        J = write_chunk(J, Jc, sl.start)
        sync(J)
    p_w = _rates(J, sync)
    sync(p_w)
    J, m_w = s_update_chunk(J, S_old[chunks[0]], eng.eps,
                            chunks[0].start,
                            size=chunks[0].stop - chunks[0].start)
    if len(chunks) > 1:
        sl = chunks[-1]
        J, m_w = s_update_chunk(J, S_old[sl], eng.eps, sl.start,
                                size=sl.stop - sl.start)
    float(m_w)
    del J, Jc, p_w
    rec["phases"]["compile_s"] = time.time() - t0

    # ---- the measured iteration
    t_iter0 = time.time()
    J = jnp.zeros(S_old.shape, dtype)
    for sl in chunks:
        Jc = J_chunk(S_old[sl], lam[sl])
        J = write_chunk(J, Jc, sl.start)
        sync(J)               # backpressure, ~30 ms/chunk via the tunnel
    tJ = time.time() - t_iter0

    t0 = time.time()
    new_pops = _rates(J, sync)
    sync(new_pops)
    tR = time.time() - t0

    t0 = time.time()
    diff = 0.0
    for sl in chunks:
        J, m = s_update_chunk(J, S_old[sl], eng.eps, sl.start,
                              size=sl.stop - sl.start)
        diff = max(diff, float(m))   # scalar readback = backpressure
    tS = time.time() - t0
    t_iter = time.time() - t_iter0

    n_pts = args.nz * args.nx * args.ny
    rec["phases"].update({"J_pass_s": tJ, "rates_SE_s": tR,
                          "S_update_criterion_s": tS})
    rec["iteration_seconds_measured"] = t_iter
    rec["criterion_diff"] = diff
    rec["pops_finite"] = bool(np.isfinite(float(jnp.sum(new_pops))))
    rec["pts_rays"] = n_pts * quad.n_angles * line.n_lambda
    rec["iteration_throughput_pts_rays_per_s"] = rec["pts_rays"] / t_iter
    rec["reference"] = {
        "full_run_s_10threads": REF_FULL_RUN_S,
        "assumed_iterations": REF_ASSUMED_ITERS,
        "derived_s_per_iteration": REF_FULL_RUN_S / REF_ASSUMED_ITERS,
    }
    rec["vs_baseline_measured_iteration"] = (
        (REF_FULL_RUN_S / REF_ASSUMED_ITERS) / t_iter)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
