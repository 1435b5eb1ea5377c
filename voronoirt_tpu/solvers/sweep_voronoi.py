"""Irregular-grid (Voronoi) wavefront sweep, TPU-native.

Reference parity: src/irregular_ray_tracing.jl (Delaunay_upII/_downII):
BFS layers from the boundary wall; within each layer n_sweeps relaxation
passes; per site, blend the formal solutions along the two most-upwind
Delaunay edges (the edge IS the characteristic -- intensities are read at
upwind sites directly, no interpolation).

TPU design: the per-site serial loop becomes a padded per-layer gather
kernel driven by a static VoronoiPlan.  lax.scan walks the layers (the
irreducibly sequential wavefront direction); within a layer all sites and
the wavelength batch update simultaneously.  In-layer data dependencies
(upwind neighbours in the SAME layer) are resolved by the same fixed
n_sweeps pass count the reference uses; the reference's passes are
Gauss-Seidel in site order while these are Jacobi (order-free, parallel)
-- the fixed point is identical and the searchlight/identity fixtures
bound the difference (see tests/test_sweep_voronoi.py).

Ordering modes (grid/voronoi.py build_voronoi_plan):
  'layer' (default, reference parity): BFS wall-distance layers,
    n_sweeps passes per layer.  Fixed pass counts truncate horizontal
    propagation -- at grazing angles (10 of the 12 production ul7n12
    directions have |mu| <= 0.42) most of a zero-opacity beam is lost.
  'wavefront': exact Kahn levels over the 2-upwind dependency DAG (one
    pure-gather pass per level, every upwind already final) plus
    s = pos.k sorted bins with global repeats for seam-wrapping chains.
    Reaches the global fixed point of the per-site equations (tests).

Shapes: fields (B, n); intensity uses one extra dummy slot (B, n+1) so
padded layer slots scatter harmlessly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .formal import linear_weights


def _staged_scan(I, S1, a1, schedule, up_pad, w_pad, r_pad, passes):
    """lax.scan over one padded level/layer schedule, `passes` Jacobi
    passes per step (1 = pure gather for exact topological levels)."""
    up_l = up_pad[schedule]             # (L, Wmax, 2)
    w_l = w_pad[schedule]               # (L, Wmax, 2)
    r_l = r_pad[schedule]               # (L, Wmax, 2)

    def layer_body(I, xs):
        ids, up2, w2, r2 = xs           # (Wmax,), (Wmax,2), ...
        a_c = a1[:, ids]                # (B, Wmax)
        s_c = S1[:, ids]
        a_u = a1[:, up2]                # (B, Wmax, 2)
        s_u = S1[:, up2]
        dtau = r2[None] * (a_c[..., None] + a_u) * 0.5
        aw, bw, ew = linear_weights(dtau)

        for _ in range(passes):
            i_u = I[:, up2]             # (B, Wmax, 2)
            contrib = ew * i_u + aw * s_u + bw * s_c[..., None]
            i_new = jnp.sum(w2[None] * contrib, axis=-1)
            I = I.at[:, ids].set(i_new)
        return I, None

    I, _ = jax.lax.scan(layer_body, I, (schedule, up_l, w_l, r_l))
    return I


@partial(jax.jit, static_argnames=("stage_passes", "stage_repeats"))
def _sweep_impl(schedules, stage_passes, stage_repeats, upwind, weights, r,
                bc_sites, S, alpha, I0):
    """schedules: tuple of (L_i, W_i) padded site-id arrays, executed in
    order; stage_passes: static per-stage Jacobi pass counts (1 for
    exact topological levels); stage_repeats: static global repeats of a
    stage's whole schedule (seam-wrapping relaxation)."""
    B, n = S.shape
    S1 = jnp.concatenate([S, jnp.zeros((B, 1), S.dtype)], axis=1)
    a1 = jnp.concatenate([alpha, jnp.zeros((B, 1), alpha.dtype)], axis=1)

    I = jnp.zeros((B, n + 1), dtype=S.dtype)
    I = I.at[:, bc_sites].set(I0)

    # pad geometry with a dummy row so padded layer slots (id == n)
    # gather cleanly
    up_pad = jnp.concatenate(
        [upwind, jnp.full((1, 2), n, dtype=upwind.dtype)], axis=0)
    w_pad = jnp.concatenate([weights, jnp.zeros((1, 2), weights.dtype)],
                            axis=0)
    r_pad = jnp.concatenate([r, jnp.zeros((1, 2), r.dtype)], axis=0)

    for schedule, passes, repeats in zip(schedules, stage_passes,
                                         stage_repeats):
        if repeats == 1:
            I = _staged_scan(I, S1, a1, schedule, up_pad, w_pad, r_pad,
                             passes)
        else:
            I = jax.lax.fori_loop(
                0, repeats,
                lambda _, I: _staged_scan(I, S1, a1, schedule, up_pad,
                                          w_pad, r_pad, passes), I)
    return I[:, :n]


def sweep_voronoi(plan, S, alpha, I0, n_sweeps=3):
    """Formal solution over the irregular grid along plan.k.

    Args:
      plan: VoronoiPlan (static geometry for one direction).
      S, alpha: (B, n) or (n,) source function / extinction.
      I0: (B, n_bc) or (n_bc,) boundary intensity on plan.bc_sites
          (bottom-layer sites for up sweeps: lambda_iteration.jl:99-102).
    Returns:
      I with the shape of S.
    """
    squeeze = S.ndim == 1
    if squeeze:
        S, alpha, I0 = S[None], alpha[None], I0[None]
    if getattr(plan, "exact_levels", None) is not None or \
            getattr(plan, "relax_levels", None) is not None:
        schedules, passes, repeats = [], [], []
        if plan.exact_levels is not None:
            schedules.append(jnp.asarray(plan.exact_levels))
            passes.append(1)
            repeats.append(1)
        if plan.relax_levels is not None:
            # narrow bins (width ~ mean edge advance / 2): one pass per
            # bin; global repeats carry seam-wrapping contributions
            schedules.append(jnp.asarray(plan.relax_levels))
            passes.append(1)
            repeats.append(int(getattr(plan, "relax_repeats", 1)))
    else:
        schedules = [jnp.asarray(plan.layer_sites)]
        passes = [n_sweeps]
        repeats = [1]
    I = _sweep_impl(tuple(schedules), tuple(passes), tuple(repeats),
                    jnp.asarray(plan.upwind.astype(np.int32)),
                    jnp.asarray(plan.weights), jnp.asarray(plan.r),
                    jnp.asarray(plan.bc_sites), S, alpha, I0)
    return I[0] if squeeze else I
