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

    # the reference's large branch divides by the TRUE dtau
    # (functions.jl:491-493), not a clipped one
    alpha_large = 1.0 / jnp.maximum(dtau, 1.0)
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


def bezier_weights(dtau):
    """Quadratic (DELO-)Bezier formal-solution weights.

    The source function over one ray interval is a quadratic Bezier
    curve B(u) = (1-u)^2 S_up + 2u(1-u) C + u^2 S_c (u = t/dtau measured
    from the upwind point; de la Cruz Rodriguez & Piskunov 2013, ApJ
    764:33).  The update is
        I = exp(-dtau) I_up + w_up S_up + w_c S_c + w_ctrl C.
    Exact for S quadratic in tau when C = S_up + (dtau/2) S'_up.

    Not in the reference (functions.jl has only linear_weights); the
    higher-order upgrade listed in BASELINE.json's north star.
    Returns (w_up, w_c, w_ctrl, exp(-dtau)).
    """
    dtau = jnp.asarray(dtau)
    dt = jnp.clip(dtau, 0.05, 50.0)       # safe lanes for the mid branch
    E = jnp.exp(-dt)
    # J_k = int_0^dt t^k e^{t-dt} dt / dt^k
    J0 = 1.0 - E
    J1 = dt - J0
    J2 = dt * dt - 2.0 * J1
    w_up_mid = J0 - 2.0 * J1 / dt + J2 / (dt * dt)
    w_ctrl_mid = 2.0 * (J1 / dt - J2 / (dt * dt))
    w_c_mid = J2 / (dt * dt)

    # small-dtau series (J2/dt^2 cancels catastrophically otherwise)
    d = dtau
    w_up_small = d * (1.0 / 3.0 + d * (-0.25 + d * (0.1 - d / 36.0)))
    w_ctrl_small = d * (1.0 / 3.0 + d * (-1.0 / 6.0
                                         + d * (0.05 - d / 90.0)))
    w_c_small = d * (1.0 / 3.0 + d * (-1.0 / 12.0
                                      + d * (1.0 / 60.0 - d / 360.0)))
    exp_small = 1.0 - d + 0.5 * d * d - d * d * d / 6.0

    # large-dtau limit (E -> 0; true dtau, not the mid-branch clip)
    dl = jnp.maximum(dtau, 1.0)
    w_up_large = 2.0 / (dl * dl)
    w_ctrl_large = 2.0 / dl - 4.0 / (dl * dl)
    w_c_large = 1.0 - 2.0 / dl + 2.0 / (dl * dl)

    small = dtau < 0.05
    large = dtau > 50.0
    w_up = jnp.where(small, w_up_small,
                     jnp.where(large, w_up_large, w_up_mid))
    w_ctrl = jnp.where(small, w_ctrl_small,
                       jnp.where(large, w_ctrl_large, w_ctrl_mid))
    w_c = jnp.where(small, w_c_small,
                    jnp.where(large, w_c_large, w_c_mid))
    expdt = jnp.where(small, exp_small, jnp.where(large, 0.0, E))
    return w_up, w_c, w_ctrl, expdt


def bezier_control(S_uu, S_up, S_c, dtau_uu, dtau, first=0.0):
    """Monotonicity-limited Bezier control point at the upwind node.

    C = S_up + (dtau/2) S'_up with S'_up the Steffen (1990) limited
    derivative from the upstream (S_uu -> S_up over dtau_uu) and current
    (S_up -> S_c over dtau) intervals: the weighted 3-point difference
    (exact for S quadratic in tau) clipped to 2 min(|d1|, |d2|) and
    zeroed at extrema.  The limiting keeps C within
    [min(S_up, S_c), max(S_up, S_c)], so the scheme is
    positivity-preserving for S >= 0.

    first=1 marks intervals with no upstream sample (the boundary plane,
    a sweep-segment start): the slope falls back to the secant d2, which
    makes the Bezier update coincide with the linear two-point scheme.
    """
    eps = jnp.asarray(1e-300 if S_up.dtype == jnp.float64 else 1e-30,
                      S_up.dtype)
    h1 = jnp.maximum(dtau_uu, eps)
    h2 = jnp.maximum(dtau, eps)
    d1 = (S_up - S_uu) / h1
    d2 = (S_c - S_up) / h2
    p = (d1 * h2 + d2 * h1) / (h1 + h2)
    slope = jnp.where(
        d1 * d2 > 0.0,
        jnp.sign(d2) * jnp.minimum(jnp.abs(p),
                                   2.0 * jnp.minimum(jnp.abs(d1),
                                                     jnp.abs(d2))),
        0.0)
    slope = (1.0 - first) * slope + first * d2
    return S_up + 0.5 * dtau * slope
