"""Pallas marching kernel vs the XLA scan path (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from voronoirt_tpu.solvers.sweep_regular import (build_plan, _march_plane)
from voronoirt_tpu.solvers.pallas_march import march_plane_pallas


@pytest.mark.parametrize("sign,s_base,f_line,centre_prev",
                         [(1, 0, 0.3, False), (-1, -1, 0.7, False),
                          (1, -1, 0.0, True), (-1, 0, 1.0, False)])
def test_matches_xla_march(sign, s_base, f_line, centre_prev):
    rng = np.random.default_rng(0)
    B, nx, ny = 4, 8, 8
    r = 1.7
    w_cur = 0.35
    a_p = rng.uniform(0.0, 2.0, (B, nx, ny)).astype(np.float32)
    a_c = rng.uniform(0.0, 2.0, (B, nx, ny)).astype(np.float32)
    s_p = rng.uniform(0.1, 1.0, (B, nx, ny)).astype(np.float32)
    s_c = rng.uniform(0.1, 1.0, (B, nx, ny)).astype(np.float32)
    i_p = rng.uniform(0.0, 1.0, (B, nx, ny)).astype(np.float32)

    # XLA reference path via a synthetic plan (yz case marching over x)
    import dataclasses
    from voronoirt_tpu.solvers import sweep_regular as sr

    plan = sr.RegularPlan(k=(0, 0, 0), up=True, sign_x=sign, sign_y=0,
                          sxs=0, sys=s_base, r_x=r, r_y=0.0,
                          fy_line=f_line, fx_line=0.0, segments=())
    got_xla = np.asarray(sr._march_plane(
        plan, "yz", 3, jnp.float32(w_cur), jnp.asarray(i_p),
        jnp.asarray(a_c), jnp.asarray(a_p), jnp.asarray(s_c),
        jnp.asarray(s_p), "prev" if centre_prev else "cur"))

    # pallas kernel takes the march axis leading: (Nx, B, Ny)
    t = lambda A: np.transpose(A, (1, 0, 2))
    got_pl = np.asarray(march_plane_pallas(
        jnp.asarray(t(a_p)), jnp.asarray(t(a_c)), jnp.asarray(t(s_p)),
        jnp.asarray(t(s_c)), jnp.asarray(t(i_p)), w_cur, sign=sign,
        s_base=s_base, f_line=f_line, r=r, n_sweeps=3,
        centre_prev=centre_prev, b_block=2, interpret=True))
    got_pl = np.transpose(got_pl, (1, 0, 2))

    assert np.allclose(got_pl, got_xla, rtol=2e-5, atol=1e-6)


def test_xy_pallas_matches_xla():
    from voronoirt_tpu.solvers.pallas_xy import xy_plane_pallas
    from voronoirt_tpu.solvers import sweep_regular as sr
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    B, nx, ny = 4, 8, 8
    mk = lambda: jnp.asarray(rng.uniform(0.1, 2.0, (B, nx, ny)),
                             jnp.float32)
    a_p, a_c, s_p, s_c, i_p = mk(), mk(), mk(), mk(), mk()
    for sxs, sys, fx, fy in [(0, 0, 0.3, 0.8), (-1, 0, 0.9, 0.2),
                             (0, -1, 0.0, 1.0), (-1, -1, 0.5, 0.5)]:
        plan = sr.RegularPlan(k=(0, 0, 0), up=True, sign_x=1, sign_y=1,
                              sxs=sxs, sys=sys, r_x=0, r_y=0,
                              fy_line=0, fx_line=0, segments=())
        _, want = sr._xy_step(plan, i_p,
                              (a_c, a_p, s_c, s_p, jnp.float32(1.3),
                               jnp.float32(fx), jnp.float32(fy),
                               jnp.float32(0.0)))
        got = xy_plane_pallas(a_p, a_c, s_p, s_c, i_p, 1.3,
                              sxs + fx, sys + fy, b_block=2,
                              interpret=True)
        assert np.allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                           atol=1e-6), (sxs, sys, fx, fy)
