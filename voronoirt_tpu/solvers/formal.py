"""Formal-solution quadrature weights.

Reference parity: src/functions.jl:484-500 (`linear_weights`) and :392-395
(`trapezoidal`).  The two-point linear short-characteristics update is
  I = exp(-dtau) I_up + alpha * S_up + beta * S_centre,
with Taylor guards for small (dtau < 5e-4) and large (dtau > 50) optical
depths -- guards that matter even more in float32 (SURVEY.md §7).

Vectorized with jnp.where (no data-dependent branching) so the weights
fuse into the surrounding sweep kernels.
"""

import jax.numpy as jnp


def linear_weights(dtau):
    """(alpha, beta, exp(-dtau)) weights for the two-point formal solution.

    alpha weights S_upwind, beta weights S_centre.
    """
    dtau = jnp.asarray(dtau)
    # safe value for the generic branch (avoid 0/0 in unselected lanes)
    dt_safe = jnp.clip(dtau, 5e-4, 50.0)
    exp_mid = jnp.exp(-dt_safe)
    alpha_mid = (1.0 - exp_mid) / dt_safe - exp_mid
    beta_mid = 1.0 - alpha_mid - exp_mid

    exp_small = 1.0 - dtau + 0.5 * dtau * dtau
    alpha_small = dtau * (0.5 - dtau / 3.0)
    beta_small = dtau * (0.5 - dtau / 6.0)

    alpha_large = 1.0 / dt_safe
    beta_large = 1.0 - alpha_large

    small = dtau < 5e-4
    large = dtau > 50.0
    alpha = jnp.where(small, alpha_small,
                      jnp.where(large, alpha_large, alpha_mid))
    beta = jnp.where(small, beta_small,
                     jnp.where(large, beta_large, beta_mid))
    expdt = jnp.where(small, exp_small, jnp.where(large, 0.0, exp_mid))
    return alpha, beta, expdt


def trapezoidal(dx, a, b):
    """Trapezoid: dx * (a + b) / 2 (src/functions.jl:392-395)."""
    return dx * (a + b) * 0.5
