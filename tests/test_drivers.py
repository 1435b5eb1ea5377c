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


def test_synthesize_driver(tmp_path):
    """checkpoint -> disk-centre synthesis, both grids
    (plot_utils.jl:99-140 write_top_intensity analog)."""
    env = dict(os.environ, VRT_PLATFORM="cpu")
    for grid, extra in (("regular", []),
                        ("voronoi", ["--n-sites", "800"])):
        out = str(tmp_path / f"{grid}.h5")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "drivers", "line_nlte.py"),
             "--grid", grid, "--eps", "5e-2", "--maxiter", "2",
             "--nlam-bb", "5", "--nlam-bf", "3", "--quadrature", "n2",
             "--out", out] + extra,
            capture_output=True, text=True, env=env, timeout=400)
        assert proc.returncode == 0, proc.stderr[-2000:]
        sdir = str(tmp_path / f"synth_{grid}")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "drivers", "synthesize.py"),
             out, "--out", sdir, "--no-plots"]
            + (["--raster", "8", "6", "6"] if grid == "voronoi" else []),
            capture_output=True, text=True, env=env, timeout=400)
        assert proc.returncode == 0, proc.stderr[-2000:]
        summary = json.loads(proc.stdout.strip().splitlines()[-1])
        assert summary["kind"] == grid
        I = np.load(os.path.join(sdir, f"{grid}.npy"))
        lam = np.load(os.path.join(sdir, f"{grid}_wavelength.npy"))
        assert I.shape[0] == len(lam) == summary["n_lambda"]
        assert np.all(np.isfinite(I)) and I.min() >= 0
        # line centre must be brighter than the far wing for Ly-alpha
        assert summary["I_centre_mean"] > summary["I_wing_mean"]
        assert 3000.0 < summary["Tb_centre_mean"] < 50000.0


def test_continuum_study_harness(tmp_path):
    """Grid-convergence study (compare_continuum.jl:585 +
    python/plot_LTE.py:18-52): site counts vs regular resolutions with a
    convergence metric against the full-res regular image."""
    env = dict(os.environ, VRT_PLATFORM="cpu")
    out = str(tmp_path / "study")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "drivers", "continuum_study.py"),
         "--n-sites", "2e3,2e4", "--skips", "1,2", "--out", out,
         "--no-plots"],
        capture_output=True, text=True, env=env, timeout=500)
    assert proc.returncode == 0, proc.stderr[-2000:]
    res = json.loads(proc.stdout.strip().splitlines()[-1])
    assert os.path.exists(os.path.join(out, "I_regular_full.npy"))
    assert os.path.exists(os.path.join(out, "I_irregular_20000.npy"))
    e_lo = res["voronoi"]["2000"]["rel_l1_vs_full"]
    e_hi = res["voronoi"]["20000"]["rel_l1_vs_full"]
    assert np.isfinite(e_lo) and np.isfinite(e_hi)
    # 10x more sites must not be worse (noise margin 1.2x); both bounded
    assert e_hi < max(1.2 * e_lo, 1.0) and e_hi < 0.5
    assert res["regular"]["half"]["rel_l1_vs_full"] < 0.5


def test_line_nlte_hdf5_data_path(tmp_path):
    """--data HDF5 path end-to-end: Bifrost-style file with DESCENDING z
    (axis normalization, atmosphere.jl:95-123), 5-D hydrogen_populations
    (collapsed with [..., 0, 0], atmosphere.py:92-97) and --skip striding."""
    import h5py
    from voronoirt_tpu import synthetic_atmosphere
    src = synthetic_atmosphere(nz=24, nx=12, ny=12, seed=9)
    path = str(tmp_path / "bifrost_like.h5")
    with h5py.File(path, "w") as f:
        flip = (slice(None, None, -1),)           # descending z on disk
        f["z"] = np.asarray(src.z)[::-1].reshape(-1, 1)  # (nz, 1) squeeze
        f["x"] = np.asarray(src.x)
        f["y"] = np.asarray(src.y)
        for name in ("temperature", "electron_density",
                     "velocity_z", "velocity_x", "velocity_y"):
            f[name] = np.asarray(getattr(src, name))[flip]
        nH = np.asarray(src.hydrogen_populations)[flip]
        nH5 = np.zeros(nH.shape + (2, 2))
        nH5[..., 0, 0] = nH                        # 5-D level-axes layout
        nH5[..., 1, 1] = 1e99                      # poison the other slots
        f["hydrogen_populations"] = nH5

    out = str(tmp_path / "run.h5")
    env = dict(os.environ, VRT_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "drivers", "line_nlte.py"),
         "--data", path, "--skip", "2", "--grid", "regular",
         "--eps", "5e-2", "--maxiter", "2", "--nlam-bb", "5",
         "--nlam-bf", "3", "--quadrature", "n2", "--out", out],
        capture_output=True, text=True, env=env, timeout=400)
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["iterations"] >= 1
    import h5py
    with h5py.File(out) as f:
        S = np.asarray(f["source_function"])
        # skip=2 halves each axis; the driver loads periodic=False (the
        # roll-based sweeps need no ghost layers); z ascending again
        assert S.shape[1:] == (12, 6, 6)
        assert np.all(np.isfinite(S)) and S.max() < 1e30
        z = np.asarray(f["z"])
        assert z[0] < z[-1]
