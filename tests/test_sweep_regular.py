"""Regular-grid sweep tests: oracle fixtures, published golden, physics
acceptance (searchlight beam test, SURVEY.md §4.3)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from voronoirt_tpu.solvers.sweep_regular import (build_plan,
                                                 short_characteristics)

FIX = os.path.join(os.path.dirname(__file__), "golden",
                   "regular_sweep_fixtures.npz")
REF_GOLD = "/root/reference/data/searchlight_data"


def kvec(theta_deg, phi_deg):
    t, p = np.deg2rad(theta_deg), np.deg2rad(phi_deg)
    return np.array([np.cos(t), np.cos(p) * np.sin(t), np.sin(p) * np.sin(t)])


class TestOracleFixtures:
    """Field-exact comparison against the characteristics.jl oracle."""

    @pytest.mark.parametrize("case", ["up_xy", "dn_xy", "up_yz", "dn_yz",
                                      "up_xz", "dn_xz", "up_mix", "dn_mix"])
    def test_matches_oracle(self, case):
        fx = np.load(FIX)
        k = fx[f"{case}_k"]
        z = fx[f"{case}_z"]
        S = fx[f"{case}_S"]
        alpha = fx[f"{case}_alpha"]
        I0 = fx[f"{case}_I0"]
        expected = fx[f"{case}_I"]
        up = bool(fx[f"{case}_up"])
        dx = 1.0 / S.shape[1]
        I = np.asarray(short_characteristics(k, S, alpha, I0, z, dx, dx,
                                             up=up, n_sweeps=3))
        err = np.max(np.abs(I - expected) / (np.abs(expected) + 1e-12))
        assert err < 1e-12, f"{case}: max rel err {err}"


def _beam_I0(n, R0=0.1):
    """Reference beam mask (compare_searchlight.jl:182-190): xi = i/n,
    1-based."""
    I0 = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            xi, yi = (i + 1) / n, (j + 1) / n
            if np.hypot(xi - 0.5, yi - 0.5) < R0:
                I0[i, j] = 1.0
    return I0


class TestSearchlight:
    """Physics acceptance: zero-opacity beam translation (the reference's
    #1 correctness fixture, compare_searchlight.jl:154-225)."""

    def _run(self, theta, phi, n=51):
        k = kvec(theta, phi)
        up = theta > 90
        ax = np.linspace(0, 1, n)
        # physical periodic domain = reference's interior columns 2:n-1
        phys = slice(1, n - 1)
        S = np.zeros((n, n - 2, n - 2))
        alpha = np.zeros_like(S)
        I0 = _beam_I0(n)[phys, phys]
        dx = ax[1] - ax[0]
        I = np.asarray(short_characteristics(k, S, alpha, I0, ax, dx, dx,
                                             up=up, n_sweeps=3))
        return I[-1] if up else I[0], ax[phys], I0

    def test_up_golden_160_45(self):
        """Exact match to the published golden image."""
        img, _, _ = self._run(160.0, 45.0)
        gold = np.load(os.path.join(REF_GOLD, "I_160_45_regular.npy"))
        assert img.shape == gold.shape == (49, 49)
        assert np.max(np.abs(img - gold)) < 1e-12
        assert img.sum() == pytest.approx(80.0, abs=1e-9)

    def test_down_flux_and_position(self):
        """Down sweep: flux conserved, beam at the analytic position
        (plot_utils.jl:35-47); see tests/golden/README.md for why the
        stored 20_15 file is not used directly."""
        theta, phi = 20.0, 15.0
        img, x, I0 = self._run(theta, phi)
        assert img.sum() == pytest.approx(I0.sum(), rel=1e-9)
        k = kvec(theta, phi)
        xr = (0.5 - np.sign(k[0]) * k[1] / k[0]) % 1.0
        yr = (0.5 - np.sign(k[0]) * k[2] / k[0]) % 1.0
        X, Y = np.meshgrid(x, x, indexing="ij")
        w = img / img.sum()
        # wrap-aware centroid via circular mean
        cx = np.angle(np.sum(w * np.exp(2j * np.pi * X))) / (2 * np.pi) % 1.0
        cy = np.angle(np.sum(w * np.exp(2j * np.pi * Y))) / (2 * np.pi) % 1.0
        assert abs(cx - xr) < 0.03
        assert abs(cy - yr) < 0.03

    def test_up_flux_all_quadrature_angles(self):
        """Flux conservation for all 12 production angles (hits every
        kernel case)."""
        from voronoirt_tpu.quadrature import get_quadrature
        quad = get_quadrature("ul7n12")
        n = 31
        ax = np.linspace(0, 1, n)
        S = np.zeros((n, n - 2, n - 2))
        alpha = np.zeros_like(S)
        I0 = _beam_I0(n)[1:-1, 1:-1]
        dx = ax[1] - ax[0]
        for i in range(quad.n_angles):
            k = quad.k[i]
            up = quad.is_up[i]
            I = np.asarray(short_characteristics(
                k, S, alpha, I0, ax, dx, dx, up=bool(up), n_sweeps=3))
            img = I[-1] if up else I[0]
            # n_sweeps=3 leaves a ~1e-7 periodic-wrap residual in the
            # marching cases (the reference behaves identically; its sum
            # converges to exactly I0.sum() at n_sweeps=6).
            assert img.sum() == pytest.approx(I0.sum(), rel=1e-6), \
                f"angle {i}: flux not conserved"


class TestAnalytic:
    def test_vertical_ray_homogeneous_slab(self):
        """Constant alpha & S, vertical ray: the two-point scheme is exact:
        I_top = I0 e^-tau + S (1 - e^-tau)."""
        n = 21
        nz = 40
        z = np.linspace(0.0, 1.0, nz)
        a0, S0, Iin = 3.0, 1.7, 0.4
        S = np.full((nz, n, n), S0)
        alpha = np.full((nz, n, n), a0)
        I0 = np.full((n, n), Iin)
        k = kvec(180.0, 0.0)  # straight up
        I = np.asarray(short_characteristics(k, S, alpha, I0, z, 1.0 / n,
                                             1.0 / n, up=True))
        tau = a0 * z
        expected = Iin * np.exp(-tau) + S0 * (1 - np.exp(-tau))
        got = I[:, 0, 0]
        assert np.allclose(got, expected, rtol=1e-10)

    def test_batch_axis(self):
        """(nz, B, Nx, Ny) batch matches per-slice runs."""
        rng = np.random.default_rng(0)
        nz, B, N = 8, 3, 6
        z = np.linspace(0, 1, nz)
        S = rng.uniform(0.1, 1.0, (nz, B, N, N))
        alpha = rng.uniform(0.0, 3.0, (nz, B, N, N))
        I0 = rng.uniform(0.0, 1.0, (B, N, N))
        k = kvec(150.0, 30.0)
        I = np.asarray(short_characteristics(k, S, alpha, I0, z, 1.0 / N,
                                             1.0 / N, up=True))
        for b in range(B):
            Ib = np.asarray(short_characteristics(
                k, S[:, b], alpha[:, b], I0[b], z, 1.0 / N, 1.0 / N,
                up=True))
            assert np.allclose(I[:, b], Ib, rtol=1e-12)


class TestBezierInterpolation:
    """Quadratic DELO-Bezier formal solution (formal.bezier_weights,
    sweep(..., interpolation='bezier')) -- the higher-order upgrade of
    BASELINE.json's north star; not present in the reference."""

    def test_weight_identities(self):
        from voronoirt_tpu.solvers.formal import bezier_weights
        dt = jnp.asarray(np.concatenate([np.logspace(-8, -1.4, 30),
                                         np.linspace(0.051, 49, 40),
                                         [55.0, 200.0]]))
        wu, wc, wk, E = (np.asarray(v) for v in bezier_weights(dt))
        dtn = np.asarray(dt)
        Eex = np.exp(-dtn)
        assert np.allclose(wu + wc + wk, 1.0 - Eex, atol=2e-9)
        # exact for S quadratic in tau with the exact control point
        sel = dtn > 0.05        # avoid cancellation in the test's own J2
        J0 = 1 - Eex
        J1 = dtn - J0
        J2 = dtn ** 2 - 2 * J1
        a, b, c = 0.7, -0.3, 1.1
        exact = (a * J0 + b * J1 + c * J2)[sel]
        got = (wu * a + wc * (a + b * dtn + c * dtn ** 2)
               + wk * (a + 0.5 * dtn * b))[sel]
        assert np.allclose(got, exact, rtol=1e-12)

    def test_control_point_monotone_and_quadratic_exact(self):
        from voronoirt_tpu.solvers.formal import bezier_control
        # monotone quadratic S(t) = 1 + 2 t + 0.5 t^2, nodes at -h1, 0, h2
        h1, h2 = 0.4, 0.3
        Sf = lambda t: 1.0 + 2.0 * t + 0.5 * t * t
        C = float(bezier_control(jnp.asarray(Sf(-h1)), jnp.asarray(Sf(0.0)),
                                 jnp.asarray(Sf(h2)), jnp.asarray(h1),
                                 jnp.asarray(h2)))
        assert C == pytest.approx(Sf(0.0) + 0.5 * h2 * 2.0, rel=1e-12)
        # extremum -> flat control point, C within [S_up, S_c]
        C2 = float(bezier_control(jnp.asarray(3.0), jnp.asarray(2.0),
                                  jnp.asarray(5.0), jnp.asarray(0.5),
                                  jnp.asarray(0.8)))
        assert C2 == pytest.approx(2.0)

    def test_column_accuracy_beats_linear(self):
        from voronoirt_tpu.solvers.sweep_regular import short_characteristics
        nz = 33
        z = np.linspace(0.0, 1.0, nz)
        a0 = 3.0
        Sf = lambda zz: 1.0 + np.sin(3 * zz)
        S = np.tile(Sf(z)[:, None, None], (1, 4, 4))
        alpha = np.full((nz, 4, 4), a0)
        I0 = np.zeros((4, 4))
        # exact: I(z) = int_0^z S a0 e^{-a0 (z - t)} dt (closed form)
        t = z
        Iex = ((1 - np.exp(-a0 * t))
               + a0 * (a0 * np.sin(3 * t) - 3 * np.cos(3 * t)
                       + 3 * np.exp(-a0 * t)) / (a0 * a0 + 9.0))
        k = np.array([-1.0, 0.0, 0.0])
        errs = {}
        for interp in ("linear", "bezier"):
            I = np.asarray(short_characteristics(
                k, jnp.asarray(S), jnp.asarray(alpha), jnp.asarray(I0),
                z, 1.0, 1.0, up=True, interpolation=interp))
            errs[interp] = np.abs(I[:, 0, 0] - Iex).max()
        assert errs["bezier"] < errs["linear"] / 3.0

    def test_oblique_bracket_and_finite(self):
        from voronoirt_tpu.solvers.sweep_regular import short_characteristics
        rng = np.random.default_rng(0)
        nz = 12
        z = np.linspace(0, 1, nz)
        S = rng.uniform(0.2, 1.0, (nz, 3, 8, 8))
        alpha = rng.uniform(0, 5, (nz, 3, 8, 8))
        I0 = rng.uniform(0, 1, (3, 8, 8))
        th = np.deg2rad(160.0)
        k = np.array([np.cos(th), np.cos(0.8) * np.sin(th),
                      np.sin(0.8) * np.sin(th)])
        I = np.asarray(short_characteristics(
            k, jnp.asarray(S), jnp.asarray(alpha), jnp.asarray(I0),
            z, 0.1, 0.1, up=True, interpolation="bezier"))
        assert np.isfinite(I).all()
        lo = min(S.min(), I0.min())
        hi = max(S.max(), I0.max())
        assert I.min() >= lo - 1e-12 and I.max() <= hi + 1e-12
