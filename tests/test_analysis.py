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


def test_tau_unity_slanted_homogeneous():
    """Homogeneous alpha: tau=1 at z_top - |kz|/alpha along the slant."""
    from analysis.plots import tau_unity_height_slanted
    nz, nx, ny = 40, 8, 8
    z = np.linspace(0.0, 2.0, nz)
    x = np.arange(nx) * 0.1
    y = np.arange(ny) * 0.1
    a0 = 4.0
    alpha = np.full((nz, nx, ny), a0)
    th = np.deg2rad(150.0)
    k = np.array([np.cos(th), np.sin(th) * 0.6, np.sin(th) * 0.8])
    h = tau_unity_height_slanted(alpha, z, x, y, k)
    # tau(path) = a0 * path; path to height hh = (z_top - hh)/|kz|
    expected = z[-1] - abs(k[0]) / a0
    assert np.allclose(h, expected, atol=(z[1] - z[0]))


def test_tau_unity_slanted_vertical_matches_vertical():
    from analysis.plots import tau_unity_height, tau_unity_height_slanted
    rng = np.random.default_rng(3)
    nz, nx, ny = 30, 6, 6
    z = np.linspace(0.0, 1.0, nz)
    x = np.arange(nx) * 0.2
    y = np.arange(ny) * 0.2
    alpha = 10.0 ** rng.uniform(-0.5, 1.5, (nz, nx, ny))
    h0 = tau_unity_height(alpha, z)
    h1 = tau_unity_height_slanted(alpha, z, x, y,
                                  np.array([-1.0, 0.0, 0.0]))
    assert np.allclose(h0, h1, atol=1e-10)
