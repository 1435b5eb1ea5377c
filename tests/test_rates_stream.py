"""Streamed (chunk-accumulated) radiative rates == the all-at-once
calculate_R (up to float addition order).

The streaming form (physics/rates.py calculate_R_chunk) is what lets
the production regular grid iterate without a resident (91, nz, nx, ny)
J cube (5.13 GB); its pair bookkeeping (one-row chunk overlap, window
boundaries, the compat sigma_ic window-edge wavelength) must reproduce
calculate_R exactly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from voronoirt_tpu.physics import lyman_alpha_line
from voronoirt_tpu.physics.broadening import damping, gamma_constant
from voronoirt_tpu.physics.lte import lte_populations
from voronoirt_tpu.physics.rates import calculate_R, calculate_R_chunk


def _setup(nlam_bb=11, nlam_bf=5, n=64):
    rng = np.random.default_rng(3)
    T = jnp.asarray(rng.uniform(4000.0, 12000.0, n))
    ne = jnp.asarray(10.0 ** rng.uniform(16, 18, n))
    nH = jnp.asarray(10.0 ** rng.uniform(18, 20, n))
    line = lyman_alpha_line(nlam_bb, nlam_bf, T)
    lte = lte_populations(line, T, ne, nH)
    g_cell = gamma_constant(line, T, lte[..., 0] + lte[..., 1], ne,
                            gamma_natural=True)
    J = jnp.asarray(10.0 ** rng.uniform(-8, -5, (line.n_lambda, n)))
    return line, T, lte, g_cell, J


@pytest.mark.parametrize("compat", ["reference", "fixed"])
@pytest.mark.parametrize("chunk", [4, 7, 13, 100])
def test_chunked_equals_full(compat, chunk):
    line, T, lte, g_cell, J = _setup()
    lam = jnp.asarray(line.lam).reshape((-1, 1))
    damp = damping(g_cell[None], lam, line.dlamD[None])
    R_full = calculate_R(line, J, damp, lte, T, compat=compat)

    acc = None
    nlam = line.n_lambda
    starts = list(range(0, nlam, chunk))
    for ci, s in enumerate(starts):
        stop = min(s + chunk, nlam)
        r0 = s if ci == 0 else s - 1          # one-row overlap
        acc = calculate_R_chunk(line, acc, J[r0:stop], r0, g_cell,
                                lte, T, compat=compat)
    assert set(acc) == set(R_full)
    for k in R_full:
        a, b = np.asarray(acc[k]), np.asarray(R_full[k])
        np.testing.assert_allclose(a, b, rtol=5e-13, atol=0,
                                   err_msg=str(k))


class TestStreamedIteration:
    """RegularEngine with stream_rates=True must reproduce the standard
    loop's converged fields (rates differ only by float addition
    order; the S updates are bitwise the same arithmetic)."""

    def test_streamed_run_matches_standard(self):
        from voronoirt_tpu import Config, synthetic_atmosphere
        from voronoirt_tpu.engine.lambda_iter import RegularEngine

        atmos = synthetic_atmosphere(nz=12, nx=8, ny=8, seed=7)
        def make(stream):
            cfg = Config(nlam_bb=7, nlam_bf=4, quadrature="ul2n3",
                         maxiter=3, eps=1e-9, lambda_chunk=5,
                         stream_rates=stream,
                         rates_site_chunk=None if stream else 0)
            line = lyman_alpha_line(7, 4, jnp.asarray(atmos.temperature))
            return RegularEngine(atmos, line, cfg)

        res_std = make(False).run()
        res_str = make(True).run()
        assert res_str.iterations == res_std.iterations
        np.testing.assert_allclose(res_str.S, res_std.S,
                                   rtol=1e-10, atol=0)
        np.testing.assert_allclose(res_str.populations,
                                   res_std.populations, rtol=1e-9)
        # the criterion scalar inherits the rates' float-addition-order
        # difference through the populations -> S chain
        np.testing.assert_allclose(res_str.convergence[1:],
                                   res_std.convergence[1:], rtol=1e-6)
