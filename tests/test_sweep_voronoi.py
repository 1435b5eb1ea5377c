"""Voronoi-grid sweep tests: regular-grid-identity, analytic slab,
searchlight beam translation (SURVEY.md §4.3)."""

import numpy as np
import pytest

from voronoirt_tpu.grid import build_sites, build_voronoi_plan
from voronoirt_tpu.solvers.sweep_voronoi import sweep_voronoi


def kvec(theta_deg, phi_deg):
    t, p = np.deg2rad(theta_deg), np.deg2rad(phi_deg)
    return np.array([np.cos(t), np.cos(p) * np.sin(t), np.sin(p) * np.sin(t)])


def _fields(n):
    return dict(temperature=np.ones(n), electron_density=np.zeros(n),
                hydrogen_populations=np.zeros(n), velocity_z=np.zeros(n),
                velocity_x=np.zeros(n), velocity_y=np.zeros(n))


def _grid_sites(m, lo=0.0, hi=1.0, jitter=0.0, seed=0):
    """Sites on (or near) regular grid points, cell-centred."""
    rng = np.random.default_rng(seed)
    ax = (np.arange(m) + 0.5) / m * (hi - lo) + lo
    Z, X, Y = np.meshgrid(ax, ax, ax, indexing="ij")
    pos = np.stack([Z.ravel(), X.ravel(), Y.ravel()], axis=1)
    if jitter:
        pos += rng.uniform(-jitter, jitter, pos.shape) * (hi - lo) / m
        pos[:, 0] = np.clip(pos[:, 0], lo + 1e-6, hi - 1e-6)
        pos[:, 1:] = (pos[:, 1:] - lo) % (hi - lo) + lo
    return pos, ax


class TestRegularIdentity:
    """Sites exactly on grid points must reproduce the regular-grid
    vertical two-point scheme (compare_continuum.jl:327-446
    test_with_regular_grid)."""

    def test_vertical_homogeneous_slab(self):
        m = 8
        pos, ax = _grid_sites(m)
        n = len(pos)
        sites = build_sites(pos, (0, 1, 0, 1, 0, 1), _fields(n))
        # layers: bottom plane = layer 1, etc.
        assert sites.layers_up.max() == m
        iz_of = np.round(pos[:, 0] * m - 0.5).astype(int)
        assert np.array_equal(sites.layers_up, iz_of + 1)

        a0, S0, Iin = 2.5, 1.3, 0.6
        S = np.full(n, S0)
        alpha = np.full(n, a0)
        k = kvec(180.0, 0.0)
        plan = build_voronoi_plan(sites, k, up=True)
        I0 = np.full(len(plan.bc_sites), Iin)
        I = np.asarray(sweep_voronoi(plan, S, alpha, I0))

        # expected: two-point scheme along the vertical site chain with
        # spacing dz = 1/m; layer 1 keeps I = I0 (boundary)
        dz = 1.0 / m
        expected = np.empty(m)
        expected[0] = Iin
        from voronoirt_tpu.solvers.formal import linear_weights
        aw, bw, ew = (float(v) for v in linear_weights(a0 * dz))
        for i in range(1, m):
            expected[i] = ew * expected[i - 1] + (aw + bw) * S0
        for iz in range(m):
            got = I[iz_of == iz]
            assert np.allclose(got, expected[iz], rtol=1e-10), f"layer {iz}"

    def test_oblique_on_jittered_grid_bounded(self):
        """Slightly jittered grid, oblique ray: result stays within the
        physical bracket [min(I0,S), max(I0,S)] and is finite."""
        m = 7
        pos, _ = _grid_sites(m, jitter=0.2, seed=3)
        n = len(pos)
        sites = build_sites(pos, (0, 1, 0, 1, 0, 1), _fields(n))
        S = np.full(n, 2.0)
        alpha = np.full(n, 1.0)
        k = kvec(150.0, 40.0)
        plan = build_voronoi_plan(sites, k, up=True)
        I0 = np.full(len(plan.bc_sites), 0.5)
        I = np.asarray(sweep_voronoi(plan, S, alpha, I0))
        assert np.all(np.isfinite(I))
        assert I.min() >= 0.5 - 1e-9 and I.max() <= 2.0 + 1e-9


class TestSearchlightIrregular:
    """Beam translation through random sites (compare_searchlight.jl:10-152):
    flux approximately conserved, beam centroid at the analytic position."""

    @pytest.mark.parametrize("theta,phi,up", [(160.0, 45.0, True),
                                              (20.0, 15.0, False)])
    def test_beam(self, theta, phi, up):
        rng = np.random.default_rng(1998)
        n = 17 ** 3
        pos = rng.uniform(0, 1, (n, 3))
        sites = build_sites(pos, (0, 1, 0, 1, 0, 1), _fields(n))
        k = kvec(theta, phi)
        plan = build_voronoi_plan(sites, k, up=up)
        S = np.zeros(n)
        alpha = np.zeros(n)
        bc_pos = pos[plan.bc_sites]
        R0 = 0.22
        I0 = (np.hypot(bc_pos[:, 1] - 0.5, bc_pos[:, 2] - 0.5)
              < R0).astype(float)
        I = np.asarray(sweep_voronoi(plan, S, alpha, I0))

        # output layer = boundary layer of the opposite sweep
        layers_out = sites.layers_down if up else sites.layers_up
        out_sites = np.nonzero(layers_out == 1)[0]
        Iout = I[out_sites]
        pout = pos[out_sites]

        # flux conservation within the diffusive tolerance of the scheme
        flux_in = I0.mean() * len(plan.bc_sites)
        # compare beam areas via mean intensity (both layers sample the
        # full xy cross-section uniformly)
        assert Iout.mean() == pytest.approx(I0.mean(), rel=0.25)

        # circular-mean centroid vs analytic translated position
        xr = (0.5 - np.sign(k[0]) * k[1] / k[0]) % 1.0
        yr = (0.5 - np.sign(k[0]) * k[2] / k[0]) % 1.0
        w = Iout / Iout.sum()
        cx = np.angle(np.sum(w * np.exp(2j * np.pi * pout[:, 1]))) \
            / (2 * np.pi) % 1.0
        cy = np.angle(np.sum(w * np.exp(2j * np.pi * pout[:, 2]))) \
            / (2 * np.pi) % 1.0
        assert abs((cx - xr + 0.5) % 1.0 - 0.5) < 0.08
        assert abs((cy - yr + 0.5) % 1.0 - 0.5) < 0.08

    def test_batched_matches_single(self):
        rng = np.random.default_rng(5)
        n = 500
        pos = rng.uniform(0, 1, (n, 3))
        sites = build_sites(pos, (0, 1, 0, 1, 0, 1), _fields(n))
        plan = build_voronoi_plan(sites, kvec(135.0, 200.0), up=True)
        B = 4
        S = rng.uniform(0.1, 1.0, (B, n))
        alpha = rng.uniform(0.0, 3.0, (B, n))
        I0 = rng.uniform(0.0, 1.0, (B, len(plan.bc_sites)))
        I = np.asarray(sweep_voronoi(plan, S, alpha, I0))
        for b in range(B):
            Ib = np.asarray(sweep_voronoi(plan, S[b], alpha[b], I0[b]))
            assert np.allclose(I[b], Ib, rtol=1e-12)
