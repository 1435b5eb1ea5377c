"""Physics-core unit tests (SURVEY.md §4: turn inline assertions and
visual scripts into automated tests)."""

import numpy as np
import pytest
import jax.numpy as jnp

from voronoirt_tpu import constants as cst
from voronoirt_tpu.physics import (
    B_lambda, B_nu, voigt_H, voigt_profile, thomson, rayleigh_h,
    hminus_ff, hminus_bf, hydrogenic_ff, alpha_absorption, alpha_scattering,
    expint_E1, expint_E2, coll_exc_hydrogen_johnson,
    coll_ion_hydrogen_johnson, lte_populations, lyman_alpha_line,
    gamma_constant, n_eff, gaunt_bf)
from voronoirt_tpu.physics.broadening import damping
from voronoirt_tpu.solvers import linear_weights


class TestPlanck:
    def test_wien_peak(self):
        # Wien: lambda_max T = 2.8978e-3 m K
        T = 5778.0
        lams = np.linspace(100e-9, 2000e-9, 20000)
        B = np.asarray(B_lambda(lams, T))
        lam_peak = lams[np.argmax(B)]
        assert abs(lam_peak * T - 2.8978e-3) / 2.8978e-3 < 1e-3

    def test_known_value(self):
        # B_lambda(500 nm, 5777 K) = 2.63e13 W m^-3 sr^-1 = 26.3 kW/m2/nm
        val = float(B_lambda(500e-9, 5777.0))
        assert abs(val - 26.3) / 26.3 < 0.01

    def test_b_nu_b_lambda_consistency(self):
        # B_nu dnu = B_lambda dlam  =>  B_lambda = B_nu c/lam^2
        lam, T = 500e-9, 6000.0
        b_lam_si = float(B_lambda(lam, T)) * cst.IUNIT_SI
        b_nu = float(B_nu(cst.c_0 / lam, T))
        assert abs(b_lam_si - b_nu * cst.c_0 / lam**2) / b_lam_si < 1e-12


class TestVoigt:
    def test_vs_wofz(self):
        from scipy.special import wofz
        a = np.array([1e-4, 1e-3, 1e-2, 0.1, 0.5, 1.0, 5.0])[:, None]
        v = np.linspace(-300, 300, 1001)[None, :]
        ours = np.asarray(voigt_H(a, v))
        exact = wofz(v + 1j * a).real
        assert np.max(np.abs(ours - exact) / np.maximum(exact, 1e-10)) < 2e-4

    def test_area_norm(self):
        # integral H(a,v) dv = sqrt(pi)
        v = np.linspace(-4000, 4000, 400001)
        H = np.asarray(voigt_H(0.1, v))
        area = np.trapezoid(H, v)
        assert abs(area - np.sqrt(np.pi)) < 1e-3

    def test_profile_normalisation(self):
        dlamD = 5e-12
        v = np.linspace(-2000, 2000, 200001)
        phi = np.asarray(voigt_profile(0.05, v, dlamD))
        # integral phi dlam = 1 with dlam = v * dlamD
        area = np.trapezoid(phi, v * dlamD)
        assert abs(area - 1.0) < 1e-3


class TestOpacity:
    def test_thomson(self):
        assert float(thomson(1e20)) == pytest.approx(6.6524587321e-9)

    def test_rayleigh_edge_and_magnitude(self):
        assert float(rayleigh_h(100e-9, 1e20)) == 0.0
        # sigma(500 nm) ~ 1.0e-27 cm^2 -> alpha/nH ~ 1e-31 m^-1 per m^-3
        sig = float(rayleigh_h(500e-9, 1.0))
        assert 5e-32 < sig < 5e-31
        # diverges toward the Ly-alpha resonance
        assert float(rayleigh_h(130e-9, 1.0)) > float(rayleigh_h(500e-9, 1.0))

    def test_hminus_bf_magnitude(self):
        # peak sigma(H-) ~ 4e-17 cm^2 near 8500 A (Wishart)
        from voronoirt_tpu.physics.opacity import hminus_bf_sigma
        sig = float(hminus_bf_sigma(850e-9))
        assert 3.5e-21 < sig < 4.5e-21  # m^2
        assert float(hminus_bf_sigma(1700e-9)) == 0.0  # beyond edge

    def test_hminus_ff_positive_grows_with_lambda(self):
        T, nh, ne = 6000.0, 1e23, 1e19
        a1 = float(hminus_ff(500e-9, T, nh, ne))
        a2 = float(hminus_ff(1500e-9, T, nh, ne))
        assert 0 < a1 < a2

    def test_continuum_photosphere_scale(self):
        # Solar photosphere continuum extinction at 500 nm ~ 1e-7..1e-4 m^-1
        T, ne, nh, np_ = 6420.0, 6.4e19, 1.2e23, 6.4e19
        a = float(alpha_absorption(jnp.asarray(500e-9), T, ne, nh, np_))
        assert 1e-8 < a < 1e-3

    def test_scattering_aggregate(self):
        a = float(alpha_scattering(jnp.asarray(500e-9), 1e19, 1e23))
        assert a > float(thomson(1e19)) * 0.99


class TestExpint:
    def test_vs_scipy(self):
        from scipy.special import exp1, expn
        x = np.logspace(-4, 2, 200)
        assert np.allclose(np.asarray(expint_E1(x)), exp1(x),
                           rtol=5e-7, atol=1e-9)
        assert np.allclose(np.asarray(expint_E2(x)), expn(2, x),
                           rtol=1e-5, atol=1e-9)


class TestJohnson:
    def test_excitation_magnitude(self):
        # q(1->2)(1e4 K) ~ a few 1e-13 cm^3/s (Johnson 1972)
        ne = 1.0e6  # m^-3, i.e. exactly 1 cm^-3 -> rate == q in cm^3/s
        q = float(coll_exc_hydrogen_johnson(1, 2, ne, 1e4))
        assert 1e-14 < q < 1e-12

    def test_ionization_magnitude(self):
        ne = 1.0e6  # 1 cm^-3
        q = float(coll_ion_hydrogen_johnson(1, ne, 2e4))
        assert 1e-17 < q < 1e-10

    def test_rates_increase_with_T(self):
        ne = 1e18
        lo = float(coll_exc_hydrogen_johnson(1, 2, ne, 6e3))
        hi = float(coll_exc_hydrogen_johnson(1, 2, ne, 1.2e4))
        assert hi > lo > 0


class TestLTE:
    def _line(self, T):
        return lyman_alpha_line(5, 3, jnp.asarray(T))

    def test_conservation_and_ionization_limits(self):
        T = np.array([4000.0, 6000.0, 10000.0, 30000.0])
        ne = np.full(4, 1e18)
        nH = np.full(4, 1e20)
        line = self._line(T)
        pops = np.asarray(lte_populations(line, jnp.asarray(T),
                                          jnp.asarray(ne), jnp.asarray(nH)))
        assert pops.shape == (4, 3)
        assert np.allclose(pops.sum(-1), nH, rtol=1e-12)
        # cold -> neutral ground state; hot -> ionized
        assert pops[0, 0] / nH[0] > 0.999
        assert pops[3, 2] / nH[3] > 0.9

    def test_boltzmann_ratio(self):
        T = np.array([8000.0])
        line = self._line(T)
        pops = np.asarray(lte_populations(line, jnp.asarray(T),
                                          jnp.asarray([1e18]),
                                          jnp.asarray([1e20])))
        expected = (line.g_j / line.g_i) * np.exp(
            -(line.chi_j - line.chi_i) / (cst.k_B * T[0]))
        assert pops[0, 1] / pops[0, 0] == pytest.approx(expected, rel=1e-10)


class TestLine:
    def test_lyman_alpha_parameters(self):
        line = lyman_alpha_line(51, 20, jnp.asarray([6000.0]))
        assert line.lam0 == pytest.approx(121.568e-9, rel=1e-4)
        assert line.Aji == pytest.approx(4.70e8, rel=0.01)
        assert line.n_lambda == 91
        assert line.lam_idx == (0, 51, 71, 91)

    def test_wavelength_grid_structure(self):
        line = lyman_alpha_line(51, 20, jnp.asarray([6000.0]))
        bb = line.lam[:51]
        assert np.all(np.diff(bb) > 0)
        assert bb[25] == pytest.approx(line.lam0)
        # symmetric about line centre
        assert np.allclose(bb[25] - bb[:25], (bb[26:] - bb[25])[::-1])
        # bf grids: Lyman edge at 91.18 nm, Balmer edge at 364.7 nm
        assert line.lam[70] == pytest.approx(91.176e-9, rel=1e-3)
        assert line.lam[90] == pytest.approx(364.70e-9, rel=1e-3)

    def test_doppler_width(self):
        line = lyman_alpha_line(5, 3, jnp.asarray([6000.0]))
        # dlamD = lam0/c sqrt(2kT/m) ~ 4.04e-12 m at 6000 K
        assert float(line.dlamD[0]) == pytest.approx(4.04e-12, rel=0.01)

    def test_damping_scale(self):
        line = lyman_alpha_line(5, 3, jnp.asarray([6000.0]))
        g = gamma_constant(line, jnp.asarray([6000.0]), jnp.asarray([1e20]),
                           jnp.asarray([1e18]))
        a = float(damping(g, line.lam0, line.dlamD)[0])
        assert 1e-4 < a < 1.0  # typical Ly-alpha damping parameter

    def test_gaunt_bf_positive(self):
        assert float(gaunt_bf(91e-9, 1, 1.0)) > 0
        assert float(gaunt_bf(364e-9, 1, 2.0)) > 0


class TestLinearWeights:
    def test_sum_rule(self):
        # alpha + beta + exp(-dtau) == 1 for all dtau (exact identity)
        dt = np.logspace(-8, 3, 200)
        a, b, e = (np.asarray(v) for v in linear_weights(dt))
        assert np.allclose(a + b + e, 1.0, atol=1e-12)

    def test_matches_exact_midrange(self):
        dt = np.array([1e-3, 1e-2, 0.1, 1.0, 10.0, 49.0])
        a, b, e = (np.asarray(v) for v in linear_weights(dt))
        exact_e = np.exp(-dt)
        exact_a = (1 - exact_e) / dt - exact_e
        assert np.allclose(e, exact_e, rtol=1e-6)
        assert np.allclose(a, exact_a, rtol=1e-5)

    def test_constant_source_exact(self):
        # I = e I_up + (a+b) S must equal S when I_up = S (radiative equil.)
        dt = np.logspace(-6, 2, 50)
        a, b, e = (np.asarray(v) for v in linear_weights(dt))
        S = 3.7
        I = e * S + (a + b) * S
        assert np.allclose(I, S, rtol=1e-12)

    def test_guard_continuity(self):
        for edge in (5e-4, 50.0):
            lo, hi = edge * (1 - 1e-6), edge * (1 + 1e-6)
            wlo = np.array([np.asarray(v) for v in linear_weights(lo)])
            whi = np.array([np.asarray(v) for v in linear_weights(hi)])
            assert np.allclose(wlo, whi, atol=1e-5)


class TestH2PlusBudget:
    """H2+ approximation bound (docs/PARITY.md deviation 1).

    The Bates (1952) table is not vendorable offline; instead the H2+
    ff+bf contribution is bounded against the total continuum over the
    production parameter box, so even a factor-of-a-few recipe error
    moves the continuum by <~1%.
    """

    def _box(self):
        """LTE-consistent (T, n_e, n_h1, n_p) states over the production
        stratification (the synthetic FAL-C-like atmosphere), not free
        parameter corners -- cold gas at n_e = 1e21 is unphysical and
        would dominate the bound."""
        from voronoirt_tpu import synthetic_atmosphere
        from voronoirt_tpu.physics import lyman_alpha_line
        from voronoirt_tpu.physics.lte import lte_populations
        atmos = synthetic_atmosphere(nz=48, nx=8, ny=8, seed=3)
        T = np.asarray(atmos.temperature).ravel()
        n_e = np.asarray(atmos.electron_density).ravel()
        n_H = np.asarray(atmos.hydrogen_populations).ravel()
        line = lyman_alpha_line(5, 3, jnp.asarray(T))
        lte = np.asarray(lte_populations(line, jnp.asarray(T),
                                         jnp.asarray(n_e),
                                         jnp.asarray(n_H)))
        return T, n_e, lte[:, 0] + lte[:, 1], lte[:, 2]

    def test_h2plus_contribution_bounded(self):
        """Charge-consistent states (n_p = n_e, like a real EOS): H2+
        stays below 2% of the 500 nm continuum, so even a factor-of-a-few
        recipe error moves the continuum by <~1%.  (Saha-INconsistent
        states -- the synthetic atmosphere's independent n_e field can sit
        far below its own LTE n_p -- can push the H2+ share to tens of
        percent of a correspondingly tiny H^- continuum; documented in
        docs/PARITY.md.)"""
        from voronoirt_tpu.physics.opacity import (
            alpha_absorption, alpha_scattering, h2plus_bf, h2plus_ff)
        T, n_e, n_h1, n_p = self._box()
        n_pc = np.minimum(n_p, n_e)        # charge-consistent proton pool
        for lam, bound in ((121.568e-9, 0.25), (500e-9, 0.02)):
            tot = np.asarray(
                alpha_absorption(lam, T, n_e, n_h1, n_pc)
                + alpha_scattering(lam, n_e, n_h1))
            h2p = np.asarray(h2plus_ff(lam, T, n_h1, n_pc)
                             + h2plus_bf(lam, T, n_h1, n_pc))
            assert np.all(np.isfinite(h2p)) and np.all(h2p >= 0)
            frac = h2p / tot
            assert frac.max() < bound, (lam, frac.max())

    def test_h2plus_negligible_vs_line_at_lya(self):
        """At Ly-alpha the line opacity dwarfs the whole H-only continuum
        (and H2+ with it) by >=6 orders of magnitude -- the H2+
        approximation cannot touch the NLTE line transfer."""
        from voronoirt_tpu.physics import lyman_alpha_line
        from voronoirt_tpu.physics.atom import alpha_line, compute_profile
        from voronoirt_tpu.physics.broadening import (damping,
                                                      gamma_constant)
        from voronoirt_tpu.physics.opacity import h2plus_bf, h2plus_ff
        T, n_e, n_h1, n_p = self._box()
        line = lyman_alpha_line(5, 3, jnp.asarray(T))
        lam0 = line.lam0
        g = gamma_constant(line, jnp.asarray(T), jnp.asarray(n_h1),
                           jnp.asarray(n_e))
        a = damping(g, lam0, line.dlamD)
        prof = compute_profile(line, jnp.asarray([lam0]),
                               jnp.asarray(a)[None],
                               jnp.zeros_like(jnp.asarray(T)))
        # LTE level populations stand in for the NLTE ones here
        from voronoirt_tpu.physics.lte import lte_populations
        lte = lte_populations(line, jnp.asarray(T), jnp.asarray(n_e),
                              jnp.asarray(n_e * 0 + n_h1 + n_p))
        al = np.asarray(alpha_line(line, prof, lte[..., 1],
                                   lte[..., 0]))[0]
        h2p = np.asarray(h2plus_ff(lam0, T, n_h1, n_p)
                         + h2plus_bf(lam0, T, n_h1, n_p))
        assert (h2p / al).max() < 1e-6

    def test_h2plus_equilibrium_shape(self):
        """Equilibrium decreases with T (binding) and is linear in each
        density factor -- structural checks of the molecular Saha form."""
        from voronoirt_tpu.physics.opacity import _h2plus_equilibrium
        T = np.linspace(3000.0, 12000.0, 20)
        n = np.asarray(_h2plus_equilibrium(T, 1e20, 1e16))
        assert np.all(np.diff(n) < 0)
        lo = np.asarray(_h2plus_equilibrium(6000.0, 1e20, 1e16))
        assert np.allclose(
            np.asarray(_h2plus_equilibrium(6000.0, 2e20, 1e16)), 2 * lo,
            rtol=1e-6)
        assert np.allclose(
            np.asarray(_h2plus_equilibrium(6000.0, 1e20, 3e16)), 3 * lo,
            rtol=1e-6)

    def test_h2plus_pool_cap(self):
        """n(H2+) can never exceed either parent pool: a cold-cell
        Boltzmann factor on Saha-inconsistent inputs (docs/PARITY.md
        section 1 caveat) is capped at min(n_h1, n_p)."""
        from voronoirt_tpu.physics.opacity import _h2plus_equilibrium
        # pathological cold, dense, ionization-decoupled state
        n = np.asarray(_h2plus_equilibrium(2500.0, 1e23, 1e18))
        assert n <= 1e18 * (1 + 1e-12)
        # and the cap is inactive for ordinary photospheric states
        n2 = np.asarray(_h2plus_equilibrium(6000.0, 1e20, 1e16))
        assert n2 < 1e16

    def test_alpha_cont_golden(self):
        """Pin alpha_absorption + alpha_scattering against the dedicated
        recipe golden (analysis/regen_alpha_cont_golden.py).  The NLTE
        chain goldens inject their stored frozen alpha_cont
        (test_nlte_parity._inject_frozen), so this is the only test
        that catches an accidental continuum-recipe regression; the
        golden is regenerated only on deliberate recipe changes."""
        from voronoirt_tpu.physics.opacity import (alpha_absorption,
                                                   alpha_scattering)
        fx = np.load("tests/golden/alpha_cont_golden.npz")
        T, n_e = jnp.asarray(fx["T"]), jnp.asarray(fx["n_e"])
        n_h1, n_p = jnp.asarray(fx["n_h1"]), jnp.asarray(fx["n_p"])
        for i, lam in enumerate(fx["lambdas"]):
            got_a = np.asarray(alpha_absorption(float(lam), T, n_e,
                                                n_h1, n_p))
            got_s = np.asarray(alpha_scattering(float(lam), n_e, n_h1))
            np.testing.assert_allclose(got_a, fx[f"alpha_abs_{i}"],
                                       rtol=1e-10)
            np.testing.assert_allclose(got_s, fx[f"alpha_sca_{i}"],
                                       rtol=1e-10)

    def test_charge_inconsistency_warning(self):
        """warn_charge_inconsistency fires (once) when n_e sits >100x
        below the charge-consistent Saha proton density, and stays quiet
        for consistent states."""
        import warnings

        from voronoirt_tpu.physics import opacity as op
        T = np.full(64, 9000.0)
        n_H = np.full(64, 1e20)
        phi = 2.0 * ((2.0 * np.pi * op.m_e * op.k_B / op.h**2) * T) ** 1.5 \
            * np.exp(-op._CHI_HION_OVER_K / T)
        n_p = 0.5 * (-phi + np.sqrt(phi * phi + 4.0 * phi * n_H))
        op._warned_charge = False
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            bad = op.warn_charge_inconsistency(T, n_p, n_H)  # consistent
        assert bad == 0.0
        op._warned_charge = False
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            bad = op.warn_charge_inconsistency(T, n_p / 1e4, n_H)
        assert bad == 1.0
        assert len(w) == 1 and "Saha" in str(w[0].message)
        # once-only
        with warnings.catch_warnings(record=True) as w2:
            warnings.simplefilter("always")
            op.warn_charge_inconsistency(T, n_p / 1e4, n_H)
        assert len(w2) == 0
        op._warned_charge = False
