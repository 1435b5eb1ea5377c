"""Native upwind-selection kernel vs the numpy reference path.

The C kernel (native/voronoi_neighbors.cc vrt_upwind_select) must be
equivalent to grid/voronoi.py's numpy selection: identical upwind
CHOICES and path lengths (same streaming/top-2 semantics, same norm
association, half-even minimum image, -ffp-contract=off); the raw dot
values may differ from the BLAS matvec by <= 1 ulp, which never flips
a selection in practice and shifts blend weights by ~1e-16.
"""

import numpy as np
import pytest

from voronoirt_tpu.grid import build_sites
from voronoirt_tpu.grid.neighbors import upwind_select


def _fields(n):
    return dict(temperature=np.full(n, 6e3),
                electron_density=np.full(n, 1e18),
                hydrogen_populations=np.full(n, 1e20),
                velocity_z=np.zeros(n), velocity_x=np.zeros(n),
                velocity_y=np.zeros(n))


def _numpy_select(sites, k, compat):
    """The numpy selection path, verbatim from build_voronoi_plan."""
    n = sites.n
    nb = sites.neighbours
    W = nb.shape[1] - 1
    idx = nb[:, 1:].astype(np.int64)
    valid = (np.arange(W)[None, :] < nb[:, :1]) & (idx >= 0)
    dots = (sites.delaunay_lines.reshape(-1, 3) @ k).reshape(n, W)
    dots = np.where(valid, dots, -np.inf)
    if compat == "reference":
        d1 = np.full(n, -1.0)
        d2 = np.full(n, -1.0)
        up1 = np.zeros(n, dtype=np.int64)
        up2 = np.zeros(n, dtype=np.int64)
        for w in range(W):
            d = dots[:, w]
            cand = idx[:, w]
            beats2 = d > d2
            beats1 = beats2 & (d > d1)
            take2 = beats2 & ~beats1
            d2 = np.where(take2, d, d2)
            up2 = np.where(take2, cand, up2)
            d1 = np.where(beats1, d, d1)
            up1 = np.where(beats1, cand, up1)
        up1 = np.where(d1 > -1.0, up1, 0)
        bad2 = d2 <= 0.0
    else:
        nb_order = np.argsort(-dots, axis=1)
        i1 = nb_order[:, 0]
        i2 = nb_order[:, 1] if W > 1 else nb_order[:, 0]
        ar = np.arange(n)
        d1 = dots[ar, i1]
        d2 = dots[ar, i2]
        up1 = np.where(valid[ar, i1], idx[ar, i1], 0)
        up2 = np.where(valid[ar, i2], idx[ar, i2], up1)
        bad2 = ~np.isfinite(d2) | (d2 <= 0.0)
    up2 = np.where(bad2, up1, up2)
    d2 = np.where(bad2, 0.0, d2)
    d1 = np.maximum(np.where(np.isfinite(d1), d1, 0.0), 0.0)

    pos = sites.positions
    upwind = np.stack([up1, up2], axis=1).astype(np.int32)
    d_vec = pos[upwind] - pos[:, None, :]
    z0, z1, x0, x1, y0, y1 = sites.bounds
    Lx, Ly = x1 - x0, y1 - y0
    r_raw = np.linalg.norm(d_vec, axis=-1)
    d_vec[..., 1] -= Lx * np.round(d_vec[..., 1] / Lx)
    d_vec[..., 2] -= Ly * np.round(d_vec[..., 2] / Ly)
    r_mi = np.linalg.norm(d_vec, axis=-1)
    return upwind, np.stack([d1, d2], 1), r_raw, r_mi


@pytest.mark.parametrize("compat", ["reference", "fixed"])
@pytest.mark.parametrize("kdir", [(0.8, 0.36, 0.48), (0.2, 0.69, 0.69),
                                  (-0.9, 0.3, 0.3)])
def test_native_matches_numpy(compat, kdir):
    rng = np.random.default_rng(11)
    n = 4000
    pos = rng.uniform(0, 1, (n, 3))
    sites = build_sites(pos, (0, 1, 0, 1, 0, 1), _fields(n))
    k = np.asarray(kdir, dtype=np.float64)
    k /= np.linalg.norm(k)
    z0, z1, x0, x1, y0, y1 = sites.bounds
    out = upwind_select(sites.delaunay_lines, sites.neighbours,
                        sites.positions, k, compat == "reference",
                        x1 - x0, y1 - y0)
    if out is None:
        pytest.skip("native library unavailable")
    upw_n, d12_n, rraw_n, rmi_n = out
    upw_p, d12_p, rraw_p, rmi_p = _numpy_select(sites, k, compat)
    np.testing.assert_array_equal(upw_n, upw_p)
    # dots differ from the BLAS matvec by <= 1 ulp (summation order);
    # selections and path lengths are exact
    np.testing.assert_allclose(d12_n, d12_p, rtol=0, atol=5e-16)
    np.testing.assert_array_equal(rraw_n, rraw_p)
    np.testing.assert_array_equal(rmi_n, rmi_p)


def test_regular_grid_exact_ties(tmp_path):
    """Grid-aligned sites produce EXACT dot ties; the native streaming
    selection must resolve them identically to numpy (first-seen)."""
    g = np.linspace(0.05, 0.95, 8)
    zz, xx, yy = np.meshgrid(g, g, g, indexing="ij")
    pos = np.stack([zz.ravel(), xx.ravel(), yy.ravel()], 1)
    sites = build_sites(pos, (0, 1, 0, 1, 0, 1), _fields(len(pos)))
    k = np.asarray([1.0, 0.0, 0.0])
    z0, z1, x0, x1, y0, y1 = sites.bounds
    out = upwind_select(sites.delaunay_lines, sites.neighbours,
                        sites.positions, k, True, x1 - x0, y1 - y0)
    if out is None:
        pytest.skip("native library unavailable")
    upw_n, d12_n, _, _ = out
    upw_p, d12_p, _, _ = _numpy_select(sites, k, "reference")
    np.testing.assert_array_equal(upw_n, upw_p)
    np.testing.assert_array_equal(d12_n, d12_p)
