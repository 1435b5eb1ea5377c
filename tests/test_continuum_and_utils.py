"""Continuum scattering iteration + utility tests."""

import os
import subprocess

import numpy as np
import pytest
import jax.numpy as jnp

from voronoirt_tpu import Config, synthetic_atmosphere
from voronoirt_tpu.physics import lyman_alpha_line
from voronoirt_tpu.engine.continuum import (lambda_continuum_regular,
                                            lambda_continuum_voronoi)
from voronoirt_tpu.utils import (cumtrapz, write_sites_text,
                                 read_neighbours_text)


@pytest.fixture(scope="module")
def atmos():
    return synthetic_atmosphere(nz=10, nx=6, ny=6, seed=5)


def test_continuum_regular_converges(atmos):
    cfg = Config(eps=1e-2, maxiter=30, quadrature="ul2n3")
    line = lyman_alpha_line(1, 1, jnp.asarray(atmos.temperature))
    S, J, hist = lambda_continuum_regular(atmos, line, cfg)
    assert hist[-1] < cfg.eps
    assert np.all(np.isfinite(S)) and np.all(S > 0)
    # scattering can only redistribute: S bounded by global B range
    from voronoirt_tpu.physics import B_lambda
    B = np.asarray(B_lambda(500e-9, jnp.asarray(atmos.temperature)))
    assert S.max() <= B.max() * 1.05
    assert S.min() >= B.min() * 0.5


def test_continuum_voronoi_converges(atmos):
    from voronoirt_tpu.grid import build_sites, initialise_sites
    from voronoirt_tpu.grid.sampling import sample_sites
    cfg = Config(eps=2e-2, maxiter=30, quadrature="ul2n3")
    pos = sample_sites(atmos, 600, seed=9)
    bounds = (atmos.z[0], atmos.z[-1], atmos.x[0], atmos.x[-1],
              atmos.y[0], atmos.y[-1])
    sites = build_sites(pos, bounds, initialise_sites(pos, atmos))
    line = lyman_alpha_line(1, 1, jnp.asarray(sites.temperature))
    S, J, hist = lambda_continuum_voronoi(sites, line, cfg)
    assert hist[-1] < cfg.eps
    assert np.all(np.isfinite(S)) and np.all(S > 0)


def test_cumtrapz():
    x = np.linspace(0, 2, 101)
    y = x**2
    out = cumtrapz(x, y)
    assert abs(out[-1] - 8.0 / 3.0) < 1e-3
    assert out[0] == 0.0


def test_cli_roundtrip(tmp_path):
    """Native CLI: write sites text -> run output_sites -> parse back ->
    matches the in-process library result."""
    cli = os.path.join(os.path.dirname(__file__), "..", "native", "build",
                       "output_sites")
    if not os.path.exists(cli):
        pytest.skip("native CLI not built")
    from voronoirt_tpu.grid import voronoi_neighbors
    rng = np.random.default_rng(3)
    n = 150
    pos = rng.uniform(0, 1, (n, 3))  # (z, x, y)
    sites_file = str(tmp_path / "sites.txt")
    nb_file = str(tmp_path / "nb.txt")
    write_sites_text(pos[:, 1], pos[:, 2], pos[:, 0], sites_file)
    subprocess.run([cli, sites_file, nb_file, "0", "1", "0", "1",
                    "0", "1"], check=True, capture_output=True)
    from_cli = read_neighbours_text(nb_file, n)
    lib = voronoi_neighbors(pos, (0, 1, 0, 1, 0, 1))
    for i in range(n):
        a = sorted(from_cli[i, 1:1 + from_cli[i, 0]].tolist())
        b = sorted(lib[i, 1:1 + lib[i, 0]].tolist())
        assert a == b, f"site {i}: CLI {a} != lib {b}"
