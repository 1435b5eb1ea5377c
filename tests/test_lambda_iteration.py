"""NLTE Lambda-iteration engine tests on a hermetic synthetic atmosphere
(SURVEY.md §4.5: the Bifrost snapshot is not shipped; a smooth
stratification exercises the full path)."""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from voronoirt_tpu import Config, synthetic_atmosphere
from voronoirt_tpu.atmosphere import atmosphere_with_ghosts
from voronoirt_tpu.physics import lyman_alpha_line
from voronoirt_tpu.engine import RegularEngine, VoronoiEngine


def small_cfg(**kw):
    return Config(**{**dict(eps=5e-2, maxiter=6, nlam_bb=5, nlam_bf=3,
                            quadrature="ul2n3"), **kw})


@pytest.fixture(scope="module")
def atmos():
    return synthetic_atmosphere(nz=10, nx=6, ny=6, seed=11)


class TestRegularNLTE:
    @pytest.fixture(scope="class")
    def result(self, atmos):
        cfg = small_cfg()
        line = lyman_alpha_line(cfg.nlam_bb, cfg.nlam_bf,
                                jnp.asarray(atmos.temperature))
        eng = RegularEngine(atmos, line, cfg)
        return eng, eng.run()

    def test_shapes_and_finiteness(self, result, atmos):
        eng, res = result
        nlam = eng.line.n_lambda
        assert res.S.shape == (nlam,) + atmos.shape
        assert res.populations.shape == atmos.shape + (3,)
        assert np.all(np.isfinite(res.S)) and np.all(res.S > 0)
        assert np.all(np.isfinite(res.populations))

    def test_population_conservation(self, result, atmos):
        _, res = result
        total = res.populations.sum(-1)
        assert np.allclose(total, atmos.hydrogen_populations, rtol=1e-8)

    def test_converged(self, result):
        eng, res = result
        c = res.convergence
        # the criterion saturates at 1.0 while S grows strongly (same as
        # the reference's |1 - S_old/S_new|); it must end below eps
        assert res.converged
        assert c[-1] <= eng.cfg.eps

    def test_deep_layers_thermalized(self, result, atmos):
        """At the opaque bottom, S -> B for the line (bb) wavelengths.
        (Deep-UV bf continua legitimately see S >> B there: J from the
        hot upper layers dwarfs the local Planck function.)"""
        eng, res = result
        B0 = np.asarray(eng.B0)
        n_bb = eng.line.lam_idx[1]
        ratio = res.S[:n_bb, 0] / B0[:n_bb, 0]
        assert np.allclose(ratio, 1.0, atol=0.2)

    def test_surface_source_drops(self, result):
        """Scattering line: S < B at the surface for the line core."""
        eng, res = result
        B0 = np.asarray(eng.B0)
        core = eng.line.n_lambda // 4  # line-core index within bb block
        assert np.all(res.S[core, -1] <= B0[core, -1] * 1.05)


class TestVoronoiNLTE:
    @pytest.fixture(scope="class")
    def result(self, atmos):
        from voronoirt_tpu.grid import build_sites, initialise_sites
        from voronoirt_tpu.grid.sampling import sample_sites
        cfg = small_cfg()
        n_sites = 800
        pos = sample_sites(atmos, n_sites, seed=4)
        bounds = (atmos.z[0], atmos.z[-1], atmos.x[0], atmos.x[-1],
                  atmos.y[0], atmos.y[-1])
        fields = initialise_sites(pos, atmos)
        sites = build_sites(pos, bounds, fields)
        line = lyman_alpha_line(cfg.nlam_bb, cfg.nlam_bf,
                                jnp.asarray(sites.temperature))
        eng = VoronoiEngine(sites, line, cfg)
        return eng, eng.run()

    def test_finite_and_conserved(self, result):
        eng, res = result
        assert np.all(np.isfinite(res.S)) and np.all(res.S > 0)
        total = res.populations.sum(-1)
        assert np.allclose(total, np.asarray(eng.nH), rtol=1e-8)

    def test_converged(self, result):
        eng, res = result
        assert res.converged
        assert res.convergence[-1] <= eng.cfg.eps

    def test_bottom_thermalized(self, result):
        eng, res = result
        B0 = np.asarray(eng.B0)
        n_bb = eng.line.lam_idx[1]
        bottom = np.asarray(eng.sites.layers_up == 1)
        ratio = res.S[:n_bb][:, bottom] / B0[:n_bb][:, bottom]
        assert np.allclose(ratio, 1.0, atol=0.25)


class TestLambdaChunking:
    def test_chunked_J_matches_unchunked(self, atmos):
        """lambda_chunk must not change J (pure streaming restructure)."""
        cfg_a = small_cfg()
        cfg_b = small_cfg(lambda_chunk=4)   # 11 lambdas -> 4+4+3
        line = lyman_alpha_line(cfg_a.nlam_bb, cfg_a.nlam_bf,
                                jnp.asarray(atmos.temperature))
        ea = RegularEngine(atmos, line, cfg_a)
        eb = RegularEngine(atmos, line, cfg_b)
        damping = ea.damping_lam(ea.lte)
        Ja = np.asarray(ea.compute_J(ea.B0, ea.lte, damping))
        Jb = np.asarray(eb.compute_J(eb.B0, eb.lte, damping))
        assert np.allclose(Ja, Jb, rtol=1e-12)

    def test_chunked_damping_matches_full(self, atmos):
        """compute_J(damping_lam=None) -- per-chunk damping from the
        per-cell gamma -- must equal the materialized-cube path."""
        cfg = small_cfg(lambda_chunk=4)
        line = lyman_alpha_line(cfg.nlam_bb, cfg.nlam_bf,
                                jnp.asarray(atmos.temperature))
        eng = RegularEngine(atmos, line, cfg)
        damping = eng.damping_lam(eng.lte)
        Ja = np.asarray(eng.compute_J(eng.B0, eng.lte, damping))
        Jb = np.asarray(eng.compute_J(eng.B0, eng.lte, None))
        np.testing.assert_array_equal(Ja, Jb)

    def test_slabbed_rates_match_full(self, atmos):
        """The production-memory iteration (rates_site_chunk + chunked
        damping) reproduces the default path's populations and S."""
        from voronoirt_tpu.grid import build_sites, initialise_sites
        from voronoirt_tpu.grid.sampling import sample_sites

        pos = sample_sites(atmos, 700, seed=3)
        bounds = (atmos.z[0], atmos.z[-1], atmos.x[0], atmos.x[-1],
                  atmos.y[0], atmos.y[-1])
        sites = build_sites(pos, bounds, initialise_sites(pos, atmos))
        cfg_a = small_cfg(maxiter=2)
        cfg_b = small_cfg(maxiter=2, lambda_chunk=4,
                          rates_site_chunk=256)
        line = lyman_alpha_line(cfg_a.nlam_bb, cfg_a.nlam_bf,
                                jnp.asarray(sites.temperature))
        ra = VoronoiEngine(sites, line, cfg_a).run()
        rb = VoronoiEngine(sites, line, cfg_b).run()
        assert np.allclose(ra.S, rb.S, rtol=1e-12, atol=0)
        assert np.allclose(ra.populations, rb.populations, rtol=1e-10)
        assert ra.convergence == pytest.approx(rb.convergence, rel=1e-8)
