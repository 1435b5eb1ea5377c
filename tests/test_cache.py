"""Tessellation/plan disk cache (grid/cache.py).

The reference persists neighbours.txt and re-reads it on every launch
and resume (src/functions.jl:13-23, src/io.jl:8-40,
recover_simulation.jl:253); these tests pin the binary-cache analog:
round-trip equality, key sensitivity, and corruption tolerance.
"""

import os

import numpy as np
import pytest

from voronoirt_tpu.grid import build_sites, build_voronoi_plan
from voronoirt_tpu.grid import cache as vcache


def _fields(n):
    return dict(temperature=np.full(n, 6e3),
                electron_density=np.full(n, 1e18),
                hydrogen_populations=np.full(n, 1e20),
                velocity_z=np.zeros(n), velocity_x=np.zeros(n),
                velocity_y=np.zeros(n))


@pytest.fixture()
def pos():
    rng = np.random.default_rng(7)
    return rng.uniform(0, 1, (400, 3))


BOUNDS = (0, 1, 0, 1, 0, 1)


def test_tessellation_roundtrip(pos, tmp_path):
    cd = str(tmp_path)
    s1 = build_sites(pos, BOUNDS, _fields(len(pos)), cache_dir=cd)
    assert s1.content_key
    files = os.listdir(cd)
    assert any(f.startswith("tess-") for f in files)
    s2 = build_sites(pos, BOUNDS, _fields(len(pos)), cache_dir=cd)
    np.testing.assert_array_equal(s1.neighbours, s2.neighbours)
    np.testing.assert_array_equal(s1.layers_up, s2.layers_up)
    np.testing.assert_array_equal(s1.layers_down, s2.layers_down)
    np.testing.assert_array_equal(s1.delaunay_lines, s2.delaunay_lines)
    assert s1.content_key == s2.content_key


def test_plan_roundtrip_both_orders(pos, tmp_path):
    cd = str(tmp_path)
    sites = build_sites(pos, BOUNDS, _fields(len(pos)), cache_dir=cd)
    k = np.array([0.8, 0.36, 0.48])
    k /= np.linalg.norm(k)
    for order in ("wavefront", "layer"):
        cold = build_voronoi_plan(sites, k, up=True, order=order,
                                  cache_dir=cd)
        warm = build_voronoi_plan(sites, k, up=True, order=order,
                                  cache_dir=cd)
        for name in ("layer_sites", "upwind", "weights", "r", "bc_sites",
                     "exact_levels", "relax_levels", "gs_levels",
                     "gs_up_occ"):
            a, b = getattr(cold, name), getattr(warm, name)
            if a is None:
                assert b is None, name
            else:
                np.testing.assert_array_equal(a, b, err_msg=name)
        assert cold.relax_repeats == warm.relax_repeats
        assert cold.n == warm.n


def test_plan_key_sensitivity(pos, tmp_path):
    cd = str(tmp_path)
    sites = build_sites(pos, BOUNDS, _fields(len(pos)), cache_dir=cd)
    k = np.array([0.8, 0.36, 0.48])
    k /= np.linalg.norm(k)
    build_voronoi_plan(sites, k, up=True, order="wavefront", cache_dir=cd)
    n_before = sum(f.startswith("plan-") for f in os.listdir(cd))
    # different compat => different key => new entry (not a false hit)
    build_voronoi_plan(sites, k, up=True, order="wavefront",
                       compat="fixed", cache_dir=cd)
    n_after = sum(f.startswith("plan-") for f in os.listdir(cd))
    assert n_after == n_before + 1


def test_corrupt_entry_falls_back(pos, tmp_path):
    cd = str(tmp_path)
    sites = build_sites(pos, BOUNDS, _fields(len(pos)), cache_dir=cd)
    for f in os.listdir(cd):
        with open(os.path.join(cd, f), "wb") as fh:
            fh.write(b"garbage")
    # corrupted tessellation entry: rebuild silently
    s2 = build_sites(pos, BOUNDS, _fields(len(pos)), cache_dir=cd)
    np.testing.assert_array_equal(sites.neighbours, s2.neighbours)


def test_cache_matches_uncached(pos, tmp_path):
    """A cache-dir build equals a no-cache build array-for-array."""
    cd = str(tmp_path)
    sc = build_sites(pos, BOUNDS, _fields(len(pos)), cache_dir=cd)
    sn = build_sites(pos, BOUNDS, _fields(len(pos)))
    np.testing.assert_array_equal(sc.neighbours, sn.neighbours)
    k = np.array([0.28, 0.8, 0.53])
    k /= np.linalg.norm(k)
    pc = build_voronoi_plan(sc, k, up=True, order="wavefront",
                            cache_dir=cd)
    pc2 = build_voronoi_plan(sc, k, up=True, order="wavefront",
                             cache_dir=cd)      # hit
    pn = build_voronoi_plan(sn, k, up=True, order="wavefront")
    for name in ("upwind", "weights", "r", "bc_sites", "exact_levels",
                 "relax_levels"):
        a = getattr(pn, name)
        if a is None:
            assert getattr(pc2, name) is None
        else:
            np.testing.assert_array_equal(getattr(pc2, name), a,
                                          err_msg=name)
    assert pc.relax_repeats == pc2.relax_repeats == pn.relax_repeats
