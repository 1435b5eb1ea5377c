"""LTE (Saha-Boltzmann) populations for the 3-level H model atom.

Reference parity: src/populations.jl:77-138 (`LTE_populations`).

Level layout (level axis LAST): [n1, n2, n_HII], so
populations[..., 0:2] are the bound levels and [..., 2] the ionized stage.
"""

import jax.numpy as jnp

from ..constants import h, k_B, m_e


def lte_populations(line, temperature, electron_density, hydrogen_density):
    """Saha-Boltzmann populations, shape = temperature.shape + (3,).

    Mirrors src/populations.jl:77-103: relative Boltzmann factors for the
    bound levels, Saha factor 2 (saha_const T)^{3/2} / n_e for the
    continuum (g_HII = 1), normalized to the total hydrogen density.
    """
    chi = (line.chi_i, line.chi_j, line.chi_inf)
    g = (line.g_i, line.g_j, 1.0)

    T = temperature
    saha_const = (k_B / h) * (2.0 * jnp.pi * m_e) / h
    saha_factor = 2.0 * (saha_const * T) ** 1.5 / electron_density

    n_rel_1 = jnp.ones_like(T)
    n_rel_2 = g[1] / g[0] * jnp.exp(-jnp.clip(
        (chi[1] - chi[0]) / (k_B * T), None, 690.0))
    n_rel_3 = g[2] / g[0] * jnp.exp(-jnp.clip(
        (chi[2] - chi[0]) / (k_B * T), None, 690.0)) * saha_factor

    total = n_rel_1 + n_rel_2 + n_rel_3
    n_rel = jnp.stack([n_rel_1, n_rel_2, n_rel_3], axis=-1) / total[..., None]
    return n_rel * hydrogen_density[..., None]
