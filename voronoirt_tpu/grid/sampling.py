"""Voronoi site sampling: probability densities + rejection sampling.

Reference parity: src/sample_grids.jl (the sample_from_* family) and
src/functions.jl:79-197 (`rejection_sampling`).  The reference's
acceptance-rejection loop is per-site serial; here candidates are drawn
in vectorized batches (same distribution, same trilinear density lookup).

The paper's production runs sample from log10(N_H)^-2 * T^(-2/5)
(sample_from_invNH_invT, compare_line.jl:74).
"""

from __future__ import annotations

import numpy as np

from .interpolate import trilinear


def rejection_sampling(n_sites, atmos, quantity, seed=2022, batch=None):
    """Accept-reject sample of site positions with density ~ quantity.

    quantity: (nz, nx, ny) non-negative-ish field (compared against a
    uniform reference scaled to [q_min, q_max], functions.jl:90-117).
    Returns (n_sites, 3) positions ordered (z, x, y).
    """
    rng = np.random.default_rng(seed)
    q = np.asarray(quantity, dtype=np.float64)
    q_min, q_max = q.min(), q.max()
    dq = q_max - q_min

    z0, z1 = atmos.z[0], atmos.z[-1]
    x0, x1 = atmos.x[0], atmos.x[-1]
    y0, y1 = atmos.y[0], atmos.y[-1]

    if batch is None:
        batch = max(4 * n_sites, 1024)
    out = np.empty((n_sites, 3))
    got = 0
    while got < n_sites:
        zq = rng.uniform(z0, z1, batch)
        xq = rng.uniform(x0, x1, batch)
        yq = rng.uniform(y0, y1, batch)
        dens = trilinear(zq, xq, yq, atmos.z, atmos.x, atmos.y, q)
        accept = dens > rng.uniform(0.0, 1.0, batch) * dq + q_min
        sel = np.nonzero(accept)[0][: n_sites - got]
        take = len(sel)
        out[got:got + take, 0] = zq[sel]
        out[got:got + take, 1] = xq[sel]
        out[got:got + take, 2] = yq[sel]
        got += take
    return out


# ----------------------------------------------------- sampling densities

def density_invNH_invT(atmos):
    """log10(N_H)^-2 * T^(-2/5) (sample_grids.jl:223-230; the paper's
    production density)."""
    return (np.log10(atmos.hydrogen_populations) ** -2.0
            * atmos.temperature ** (-2.0 / 5.0))


def density_logNH_invT(atmos):
    """log10(N_H) * T^(-2/5) (sample_grids.jl:198-205)."""
    return np.log10(atmos.hydrogen_populations) * atmos.temperature ** (-0.4)


def density_logNH_invT_rootv(atmos):
    """log10(N_H) T^(-2/5) (v^2)^(1/3) (sample_grids.jl:208-221)."""
    v2 = (atmos.velocity_x ** 2 + atmos.velocity_y ** 2
          + atmos.velocity_z ** 2)
    return (np.log10(atmos.hydrogen_populations)
            * atmos.temperature ** (-0.4) * v2 ** (1.0 / 3.0))


def density_temp_gradient(atmos):
    """|dT/dz| forward differences (sample_grids.jl:97-120)."""
    T, z = atmos.temperature, atmos.z
    g = np.empty_like(T)
    g[:-1] = (T[1:] - T[:-1]) / (z[1:] - z[:-1])[:, None, None]
    g[-1] = (T[-1] - T[-2]) / (z[-1] - z[-2])
    return np.abs(g)


def density_extinction(atmos, lam0, lte_pops):
    """log10(alpha_cont(lam0)) (sample_grids.jl:24-49)."""
    import jax.numpy as jnp
    from ..physics.opacity import alpha_absorption, alpha_scattering
    a = alpha_absorption(jnp.asarray(lam0), jnp.asarray(atmos.temperature),
                         jnp.asarray(atmos.electron_density),
                         jnp.asarray(lte_pops[..., 0] + lte_pops[..., 1]),
                         jnp.asarray(lte_pops[..., 2]))
    a = a + alpha_scattering(jnp.asarray(lam0),
                             jnp.asarray(atmos.electron_density),
                             jnp.asarray(lte_pops[..., 0]))
    return np.log10(np.asarray(a))


def density_ionised_hydrogen(atmos, lte_pops):
    """log10(n_HII) in LTE (sample_grids.jl:123-134)."""
    return np.log10(lte_pops[..., 2])


def density_destruction(atmos, line, lte_pops, boost=2.0e9):
    """Photon destruction probability eps (sample_grids.jl:6-22)."""
    import jax.numpy as jnp
    from ..physics.atom import destruction
    eps = destruction(jnp.asarray(lte_pops),
                      jnp.asarray(atmos.electron_density),
                      jnp.asarray(atmos.temperature), line, boost)
    return np.asarray(eps)


def density_total_extinction(atmos, lte_pops=None, line=None):
    """log10(alpha_line(lam0, vertical LOS) + alpha_cont(lam0))
    (sample_grids.jl:51-86)."""
    import jax.numpy as jnp
    from ..physics import (lyman_alpha_line, lte_populations,
                          gamma_constant, alpha_line, voigt_profile,
                          line_of_sight_velocity)
    from ..physics.broadening import damping
    from ..constants import c_0
    T = jnp.asarray(atmos.temperature)
    ne = jnp.asarray(atmos.electron_density)
    if line is None:
        line = lyman_alpha_line(1, 1, T)
    if lte_pops is None:
        lte_pops = lte_populations(line, T, ne,
                                   jnp.asarray(atmos.hydrogen_populations))
    g = gamma_constant(line, T, lte_pops[..., 0] + lte_pops[..., 1], ne)
    a = damping(g, line.lam0, line.dlamD)
    k = np.array([-1.0, 0.0, 0.0])   # straight up
    v_los = line_of_sight_velocity(jnp.asarray(atmos.velocity_zxy()), -k)
    v = line.lam0 * v_los / c_0 / line.dlamD
    profile = voigt_profile(a, v, line.dlamD)
    a_line = alpha_line(line, profile, lte_pops[..., 1], lte_pops[..., 0])
    a_cont = 10.0 ** density_extinction(atmos, line.lam0,
                                        np.asarray(lte_pops))
    return np.log10(np.asarray(a_line) + a_cont)


def density_avg_extinction(atmos, populations, S_lam, line,
                           quadrature="ul7n12"):
    """Quadrature-weighted line+continuum extinction at line centre
    (sample_grids.jl:136-196 sample_from_avg_ext); needs a previous run's
    populations."""
    import jax.numpy as jnp
    from ..quadrature import get_quadrature
    from ..physics import (lte_populations, gamma_constant, alpha_line,
                          voigt_profile, line_of_sight_velocity)
    from ..physics.broadening import damping
    from ..constants import c_0
    T = jnp.asarray(atmos.temperature)
    ne = jnp.asarray(atmos.electron_density)
    lte = lte_populations(line, T, ne,
                          jnp.asarray(atmos.hydrogen_populations))
    g = gamma_constant(line, T,
                       jnp.asarray(populations[..., 0] + populations[..., 1]),
                       ne)
    a_damp = damping(g, line.lam0, line.dlamD)
    a_cont = 10.0 ** density_extinction(atmos, line.lam0, np.asarray(lte))
    quad = get_quadrature(quadrature)
    v_field = jnp.asarray(atmos.velocity_zxy())
    alpha_int = np.zeros(atmos.shape)
    for i in range(quad.n_angles):
        k = quad.k[i]
        v_los = line_of_sight_velocity(v_field, -k)
        v = line.lam0 * v_los / c_0 / line.dlamD
        profile = voigt_profile(a_damp, v, line.dlamD)
        a_line = alpha_line(line, profile,
                            jnp.asarray(populations[..., 1]),
                            jnp.asarray(populations[..., 0]))
        alpha_int += quad.weights[i] * np.asarray(a_line + a_cont)
    return np.log10(alpha_int)


DENSITIES = {
    "invNH_invT": density_invNH_invT,
    "logNH_invT": density_logNH_invT,
    "logNH_invT_rootv": density_logNH_invT_rootv,
    "temp_gradient": density_temp_gradient,
    "total_extinction": density_total_extinction,
}


def sample_sites(atmos, n_sites, density="invNH_invT", seed=2022):
    """Sample site positions with a named density (host-side)."""
    q = DENSITIES[density](atmos)
    return rejection_sampling(n_sites, atmos, q, seed=seed)
