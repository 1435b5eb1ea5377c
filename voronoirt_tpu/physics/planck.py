"""Planck functions.

Reference parity: src/radiation.jl:7-19 (`B_ν`, `B_λ`).
Intensity unit: kW m^-2 nm^-1 (constants.IUNIT_SI); see constants module.
"""

import jax.numpy as jnp

from ..constants import h, c_0, k_B, IUNIT_SI


def B_lambda(lam, T):
    """Planck spectral radiance per wavelength.

    Args:
      lam: wavelength [m] (scalar or array, broadcastable with T)
      T: temperature [K]
    Returns:
      B_lambda in kW m^-2 nm^-1 (== 1e12 W m^-3).

    Mirrors src/radiation.jl:17-19.  exp is evaluated with a clamped
    argument so float32 never overflows; the clamp (700) only triggers
    where B is mathematically ~0 (hc/(lam k T) > 700 => B < 1e-290).
    """
    x = h * c_0 / (lam * k_B * T)
    x = jnp.clip(x, 1e-9, 700.0)
    prefac = 2.0 * h * c_0**2 / lam**5 / IUNIT_SI
    return prefac / jnp.expm1(x)


def B_nu(nu, T):
    """Planck spectral radiance per frequency [W m^-2 Hz^-1 sr^-1] (SI).

    Mirrors src/radiation.jl:7-9.
    """
    x = h * nu / (k_B * T)
    x = jnp.clip(x, 1e-9, 700.0)
    return 2.0 * h * nu**3 / c_0**2 / jnp.expm1(x)
