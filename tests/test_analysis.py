"""Analysis-suite unit tests."""

import numpy as np

from analysis.plots import (brightness_temperature, tau_unity_height,
                            analytic_beam_center, scaling_plot,
                            line_profile, plot_convergence)
from voronoirt_tpu.physics import B_lambda


def test_brightness_temperature_inverts_planck():
    lam = 121.568e-9
    for T in (4000.0, 6000.0, 12000.0):
        I = float(B_lambda(lam, T))
        assert abs(brightness_temperature(I, lam) - T) / T < 1e-10


def test_tau_unity_homogeneous():
    # alpha = const: tau(z) = a0 (z_top - z); tau=1 at z_top - 1/a0
    nz, n = 50, 4
    z = np.linspace(0.0, 10.0, nz)
    a0 = 0.8
    alpha = np.full((nz, n, n), a0)
    hts = tau_unity_height(alpha, z)
    assert np.allclose(hts, 10.0 - 1.0 / a0, atol=0.05)


def test_analytic_beam_center_matches_reference_formula():
    k = np.array([np.cos(np.deg2rad(160.0)),
                  np.cos(np.deg2rad(45.0)) * np.sin(np.deg2rad(160.0)),
                  np.sin(np.deg2rad(45.0)) * np.sin(np.deg2rad(160.0))])
    xr, yr = analytic_beam_center(k)
    assert abs(xr - 0.2426) < 1e-3 and abs(yr - 0.2426) < 1e-3


def test_scaling_efficiency():
    eff = scaling_plot([1, 2, 4], [100.0, 50.0, 25.0])
    assert np.allclose(eff, 1.0)
    eff = scaling_plot([1, 10], [6175.0, 2330.0])  # reference threads table
    assert abs(eff[1] - 0.265) < 0.01


def test_line_profile_and_convergence_helpers(tmp_path):
    S = np.random.default_rng(0).uniform(1, 2, (7, 4, 5, 5))
    prof = line_profile(S)
    assert prof.shape == (7,)
    conv = plot_convergence([0.0, 1.0, 0.1, 0.01, 0.0],
                            out_png=str(tmp_path / "c.png"))
    assert len(conv) == 3
