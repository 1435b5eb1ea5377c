"""Single-wavelength continuum scattering Lambda iteration.

Working equivalent of the reference's bit-rotted src/lambda_continuum.jl
(SURVEY.md C17: calls removed functions; its *intent* is a 500 nm
scattering iteration S = (1 - eps) J + eps B with eps =
alpha_abs / alpha_tot and convergence masked to cells with eps > 1e-4).
This module implements that intent on both grids with the working
formal solvers.

The direct single-pass LTE images of compare_continuum.jl live in
drivers/continuum.py; this adds the iterative coherent-scattering
solution.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import Config
from ..quadrature import get_quadrature
from ..physics.planck import B_lambda
from ..physics.lte import lte_populations
from ..physics.opacity import alpha_absorption, alpha_scattering


def continuum_setup(line, temperature, electron_density, hydrogen_density,
                    lam=500e-9):
    """alpha_abs, alpha_scat, eps, B at one wavelength from ad-hoc LTE."""
    lte = lte_populations(line, temperature, electron_density,
                          hydrogen_density)
    a_abs = alpha_absorption(lam, temperature, electron_density,
                             lte[..., 0] + lte[..., 1], lte[..., 2])
    a_scat = alpha_scattering(lam, electron_density, lte[..., 0])
    a_tot = a_abs + a_scat
    eps = a_abs / a_tot
    B = B_lambda(lam, temperature)
    return a_tot, eps, B


def lambda_continuum_regular(atmos, line, cfg: Config, lam=500e-9,
                             eps_mask=1e-4):
    """Iterate S = (1-eps) J + eps B at a single wavelength, regular grid.

    Convergence: max relative S change over cells with eps > eps_mask
    (the reference's destruction-probability mask,
    lambda_continuum.jl:80,133).
    """
    from ..solvers.sweep_regular import build_plan, sweep

    T = jnp.asarray(atmos.temperature)
    a_tot, eps, B = continuum_setup(
        line, T, jnp.asarray(atmos.electron_density),
        jnp.asarray(atmos.hydrogen_populations), lam)

    quad = get_quadrature(cfg.quadrature)
    z = np.asarray(atmos.z)
    plans = [build_plan(quad.k[i], z, atmos.dx, atmos.dy,
                        bool(quad.is_up[i])) for i in range(quad.n_angles)]

    a_t = a_tot[:, None]          # (nz, 1, nx, ny) batch of one
    S = B
    mask = np.asarray(eps) > eps_mask
    history = []
    for it in range(cfg.maxiter):
        J = jnp.zeros_like(S)
        for i, plan in enumerate(plans):
            if plan.up:
                I0 = B_lambda(lam, T[0])[None]
            else:
                I0 = jnp.zeros_like(S[0])[None]
            I = sweep(plan, S[:, None], a_t, I0, n_sweeps=cfg.n_sweeps)
            J = J + quad.weights[i] * I[:, 0]
        S_new = (1.0 - eps) * J + eps * B
        rel = np.asarray(jnp.abs(1.0 - S / S_new))
        diff = float(rel[mask].max()) if mask.any() else float(rel.max())
        history.append(diff)
        S = S_new
        if diff < cfg.eps:
            break
    return np.asarray(S), np.asarray(J), history


def lambda_continuum_voronoi(sites, line, cfg: Config, lam=500e-9,
                             eps_mask=1e-4):
    """Single-wavelength scattering iteration on the irregular grid."""
    from ..grid.voronoi import build_voronoi_plan
    from ..solvers.sweep_voronoi import share_plan_shapes, sweep_voronoi

    T = jnp.asarray(sites.temperature)
    a_tot, eps, B = continuum_setup(
        line, T, jnp.asarray(sites.electron_density),
        jnp.asarray(sites.hydrogen_populations), lam)

    quad = get_quadrature(cfg.quadrature)
    plans = [build_voronoi_plan(sites, quad.k[i], bool(quad.is_up[i]),
                                p=cfg.upwind_exponent, compat=cfg.compat)
             for i in range(quad.n_angles)]
    share_plan_shapes(plans, cfg.n_sweeps)

    S = B
    mask = np.asarray(eps) > eps_mask
    history = []
    for it in range(cfg.maxiter):
        J = jnp.zeros_like(S)
        for i, plan in enumerate(plans):
            if plan.up:
                I0 = B_lambda(lam, T[plan.bc_sites])
            else:
                I0 = jnp.zeros(len(plan.bc_sites), S.dtype)
            I = sweep_voronoi(plan, S, a_tot, I0, n_sweeps=cfg.n_sweeps)
            J = J + quad.weights[i] * I
        S_new = (1.0 - eps) * J + eps * B
        rel = np.asarray(jnp.abs(1.0 - S / S_new))
        diff = float(rel[mask].max()) if mask.any() else float(rel.max())
        history.append(diff)
        S = S_new
        if diff < cfg.eps:
            break
    return np.asarray(S), np.asarray(J), history
