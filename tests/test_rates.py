"""Rate-integral unit tests: compat quirks, hand-checked values, plan
upwind selection against a direct smallest_angle reimplementation."""

import numpy as np
import pytest
import jax.numpy as jnp

from voronoirt_tpu.constants import hc, h, c_0, k_B, IUNIT_SI
from voronoirt_tpu.physics import lyman_alpha_line, lte_populations
from voronoirt_tpu.physics.rates import (Rij_integral, Rji_integral,
                                         sigma_ic, Gij, calculate_R)


@pytest.fixture(scope="module")
def line():
    return lyman_alpha_line(5, 3, jnp.asarray([8000.0, 6000.0]))


class TestRateIntegrals:
    def test_reference_vs_fixed_factor(self):
        """Reference Rij = (pair-sum)/1000 = 2*trapz/1000; fixed = trapz."""
        lam = np.array([1e-7, 1.1e-7, 1.25e-7])
        J = jnp.asarray(np.array([[1.0], [2.0], [1.5]]))
        sig = jnp.asarray(np.array([[1e-22], [2e-22], [1e-22]]))
        r_ref = float(Rij_integral(J, sig, lam, compat="reference")[0])
        r_fix = float(Rij_integral(J, sig, lam, compat="fixed")[0])
        assert r_ref == pytest.approx(2.0 * r_fix / 1000.0, rel=1e-12)

    def test_rij_hand_value(self):
        """Two-point integral against a by-hand evaluation."""
        lam = np.array([1.0e-7, 1.2e-7])
        J = jnp.asarray([[3.0], [5.0]])     # IUNIT
        sig = jnp.asarray([[1e-22], [1e-22]])
        got = float(Rij_integral(J, sig, lam, compat="fixed")[0])
        f = [2 * np.pi / hc * l * 1e-22 * (j * IUNIT_SI)
             for l, j in ((1.0e-7, 3.0), (1.2e-7, 5.0))]
        want = 0.5 * (f[0] + f[1]) * 0.2e-7
        assert got == pytest.approx(want, rel=1e-12)

    def test_rji_includes_spontaneous(self):
        """Rji > 0 even with J = 0 (the 2hc^2/lam^5 spontaneous term)."""
        lam = np.array([1.0e-7, 1.2e-7])
        J = jnp.zeros((2, 1))
        sig = jnp.asarray([[1e-22], [1e-22]])
        G = jnp.asarray([[1e-3], [1e-3]])
        got = float(Rji_integral(J, sig, G, lam, compat="fixed")[0])
        assert got > 0

    def test_sigma_ic_compat(self, line):
        """Reference: lam_edge = lam[-1], n_eff from chi_j - chi_i;
        fixed: per-level edges.  Both positive, right order of magnitude
        (hydrogen Lyman-edge cross-section ~6e-22 m^2)."""
        lam = line.lam[line.lam_idx[1]:line.lam_idx[2]]
        s_ref = np.asarray(sigma_ic(0, line, lam, "reference"))
        s_fix = np.asarray(sigma_ic(0, line, lam, "fixed"))
        assert np.all(s_ref > 0) and np.all(s_fix > 0)
        assert 1e-23 < s_fix[-1] < 1e-20

    def test_gij_detailed_balance_shape(self, line):
        T = jnp.asarray([8000.0, 6000.0])
        ne = jnp.asarray([1e18, 1e18])
        nH = jnp.asarray([1e20, 1e20])
        lte = lte_populations(line, T, ne, nH)
        G = np.asarray(Gij(0, 1, line.lam[:5], T, lte))
        assert G.shape == (5, 2)
        assert np.all(G > 0)

    def test_calculate_R_structure(self, line):
        T = jnp.asarray([8000.0, 6000.0])
        ne = jnp.asarray([1e18, 1e18])
        nH = jnp.asarray([1e20, 1e20])
        lte = lte_populations(line, T, ne, nH)
        nlam = line.n_lambda
        J = jnp.ones((nlam, 2)) * 1e-3
        damp = jnp.ones((nlam, 2)) * 1e-2
        R = calculate_R(line, J, damp, lte, T)
        assert set(R) == {(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)}
        for v in R.values():
            assert np.all(np.isfinite(np.asarray(v)))
            assert np.all(np.asarray(v) >= 0)


class TestUpwindSelection:
    def test_matches_direct_smallest_angle(self):
        """Plan builder vs a direct per-site reimplementation of
        smallest_angle (voronoi_utils.jl:360-396)."""
        from voronoirt_tpu.grid import build_sites, build_voronoi_plan
        rng = np.random.default_rng(12)
        n = 300
        pos = rng.uniform(0, 1, (n, 3))
        fields = {k: np.zeros(n) for k in
                  ("temperature", "electron_density",
                   "hydrogen_populations", "velocity_z", "velocity_x",
                   "velocity_y")}
        sites = build_sites(pos, (0, 1, 0, 1, 0, 1), fields)
        k = np.array([-0.5, 0.6, 0.624])
        k /= np.linalg.norm(k)
        plan_ref = build_voronoi_plan(sites, k, up=True)
        plan_fix = build_voronoi_plan(sites, k, up=True, compat="fixed")

        nb = sites.neighbours
        for i in rng.choice(n, 40, replace=False):
            dots, idxs = [], []
            for j in range(nb[i, 0]):
                v = nb[i, 1 + j]
                if v < 0:
                    continue
                d = float(np.dot(sites.delaunay_lines[i, j], k))
                dots.append(d)
                idxs.append(v)
            # compat='fixed': the true top-2 by dot product
            order = np.argsort(dots)[::-1]
            d1, i1 = dots[order[0]], idxs[order[0]]
            if len(order) > 1 and dots[order[1]] > 0:
                d2, i2 = dots[order[1]], idxs[order[1]]
            else:
                d2, i2 = 0.0, i1
            assert plan_fix.upwind[i, 0] == i1
            assert plan_fix.upwind[i, 1] == i2
            p = 7.0
            tot = d1**p + d2**p
            assert plan_fix.weights[i, 0] == pytest.approx(d1**p / tot)

            # compat='reference': the streaming scan in stored order --
            # a new maximum does NOT demote the old one to slot 2
            # (voronoi_utils.jl:360-396; docs/PARITY.md item 3b)
            s1 = s2 = -1.0
            j1 = j2 = None
            for d, v in zip(dots, idxs):
                if d > s2:
                    if d > s1:
                        s1, j1 = d, v
                    else:
                        s2, j2 = d, v
            if s2 <= 0:
                s2, j2 = 0.0, j1
            assert plan_ref.upwind[i, 0] == j1
            assert plan_ref.upwind[i, 1] == j2
            tot = s1**p + s2**p
            assert plan_ref.weights[i, 0] == pytest.approx(s1**p / tot)


def test_initialise_nearest_corner():
    from voronoirt_tpu.grid.interpolate import initialise_nearest_corner
    from voronoirt_tpu import synthetic_atmosphere
    atmos = synthetic_atmosphere(nz=8, nx=6, ny=6)
    # sites exactly on grid points must copy those grid values
    pos = np.array([[atmos.z[2], atmos.x[3], atmos.y[1]],
                    [atmos.z[5], atmos.x[0], atmos.y[4]]])
    out = initialise_nearest_corner(pos, atmos)
    assert out["temperature"][0] == pytest.approx(
        atmos.temperature[2, 3, 1])
    assert out["temperature"][1] == pytest.approx(
        atmos.temperature[5, 0, 4])
