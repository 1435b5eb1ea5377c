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

Shapes: fields (B, n); intensity uses one extra dummy slot (B, n+1) so
padded layer slots scatter harmlessly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .formal import linear_weights


@partial(jax.jit, static_argnames=("n_sweeps",))
def _sweep_impl(layer_sites, upwind, weights, r, bc_sites, S, alpha, I0,
                n_sweeps):
    B, n = S.shape
    S1 = jnp.concatenate([S, jnp.zeros((B, 1), S.dtype)], axis=1)
    a1 = jnp.concatenate([alpha, jnp.zeros((B, 1), alpha.dtype)], axis=1)

    I = jnp.zeros((B, n + 1), dtype=S.dtype)
    I = I.at[:, bc_sites].set(I0)

    # pad geometry with a dummy row so padded layer slots (id == n) gather
    # cleanly, then gather per-layer static data once (it doesn't change
    # between sweeps)
    up_pad = jnp.concatenate(
        [upwind, jnp.full((1, 2), n, dtype=upwind.dtype)], axis=0)
    w_pad = jnp.concatenate([weights, jnp.zeros((1, 2), weights.dtype)],
                            axis=0)
    r_pad = jnp.concatenate([r, jnp.zeros((1, 2), r.dtype)], axis=0)
    up_l = up_pad[layer_sites]          # (L, Wmax, 2)
    w_l = w_pad[layer_sites]            # (L, Wmax, 2)
    r_l = r_pad[layer_sites]            # (L, Wmax, 2)

    def layer_body(I, xs):
        ids, up2, w2, r2 = xs           # (Wmax,), (Wmax,2), ...
        a_c = a1[:, ids]                # (B, Wmax)
        s_c = S1[:, ids]
        a_u = a1[:, up2]                # (B, Wmax, 2)
        s_u = S1[:, up2]
        dtau = r2[None] * (a_c[..., None] + a_u) * 0.5
        aw, bw, ew = linear_weights(dtau)

        def passes(I, _):
            i_u = I[:, up2]             # (B, Wmax, 2)
            contrib = ew * i_u + aw * s_u + bw * s_c[..., None]
            i_new = jnp.sum(w2[None] * contrib, axis=-1)
            return I.at[:, ids].set(i_new), None

        for _ in range(n_sweeps):
            I, _ = passes(I, None)
        return I, None

    I, _ = jax.lax.scan(layer_body, I, (layer_sites, up_l, w_l, r_l))
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
    I = _sweep_impl(jnp.asarray(plan.layer_sites),
                    jnp.asarray(plan.upwind.astype(np.int32)),
                    jnp.asarray(plan.weights), jnp.asarray(plan.r),
                    jnp.asarray(plan.bc_sites), S, alpha, I0,
                    n_sweeps=n_sweeps)
    return I[0] if squeeze else I
