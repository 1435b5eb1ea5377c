"""End-to-end driver smoke tests (small configs, CPU)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_searchlight_regular_flux():
    sys.path.insert(0, os.path.join(REPO, "drivers"))
    from searchlight import run_regular
    res = run_regular(n=21)
    for rec in res:
        assert rec["flux_out"] == pytest.approx(rec["flux_in"], rel=1e-4)


def test_continuum_driver_roundtrip(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "drivers"))
    import continuum as cont
    from voronoirt_tpu import synthetic_atmosphere
    atmos = synthetic_atmosphere(nz=12, nx=8, ny=8, seed=1)
    img_r = cont.run_regular(atmos, str(tmp_path))
    assert np.all(np.isfinite(img_r)) and img_r.shape == (8, 8)
    img_v = cont.run_voronoi(atmos, 1500, str(tmp_path))
    assert np.all(np.isfinite(img_v))
    # grid-representation error should be bounded for a smooth atmosphere
    rel = np.abs(img_v - img_r) / np.abs(img_r)
    assert np.median(rel) < 0.5
    assert os.path.exists(tmp_path / "I_regular.npy")


def test_line_nlte_driver_cli(tmp_path):
    out = str(tmp_path / "run.h5")
    env = dict(os.environ, VRT_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "drivers", "line_nlte.py"),
         "--grid", "regular", "--eps", "5e-2", "--maxiter", "3",
         "--nlam-bb", "5", "--nlam-bf", "3", "--quadrature", "n2",
         "--out", out],
        capture_output=True, text=True, env=env, timeout=400)
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["iterations"] >= 1
    import h5py
    with h5py.File(out) as f:
        assert "source_function" in f and "convergence" in f
