"""Thesis-depth NLTE line figures: regular vs Voronoi comparison.

Reference parity: python/plot_line.py (disk-centre Ly-alpha images at
line centre / wing / continuum, spatially averaged profiles,
brightness-temperature maps, convergence histories; :1-665) driven from
the checkpoints compare_line.jl writes.  This module produces the same
figure families from two finished runs of drivers/line_nlte.py (one
--grid regular, one --grid voronoi), re-synthesizing emergent intensity
cubes at several mu values through drivers/synthesize.py's machinery.

Usage:
  python analysis/line_figures.py REG.h5 VOR.h5 --out DIR
      [--raster NZ NX NY] [--mus 1.0 0.6 0.2]
"""

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

from voronoirt_tpu.platform import setup as _platform_setup
_platform_setup(platform=os.environ.get("VRT_PLATFORM") or None, x64=True)

import numpy as np


def _load(path, raster):
    import h5py
    from drivers.synthesize import _load_regular, _load_voronoi
    with h5py.File(path, "r") as f:
        kind = "voronoi" if "positions" in f else "regular"
        if kind == "voronoi":
            atmos, pops, lam = _load_voronoi(f, raster)
        else:
            atmos, pops, lam = _load_regular(f)
        n_bb = int(np.asarray(f["n_bb"])[0])
        n_bf = int(np.asarray(f["n_bf"])[0])
        conv = np.asarray(f["convergence"])
        t_total = float(np.asarray(f["time"])[0]) if "time" in f else None
    conv = conv[conv > 0]
    return dict(kind=kind, atmos=atmos, pops=pops, lam=lam, n_bb=n_bb,
                n_bf=n_bf, convergence=conv, time=t_total)


def _theta_for_mu(mu):
    """Upward sweeps have theta > 90 deg, mu = |cos theta|
    (lambda_iteration.jl:38-44)."""
    return float(np.degrees(np.arccos(-abs(mu))))


def synthesize_mu(run, mu, phi=0.0, n_sweeps=3):
    from drivers.synthesize import synthesize
    I_top, line = synthesize(run["atmos"], run["pops"], run["lam"],
                             theta=_theta_for_mu(mu), phi=phi,
                             n_sweeps=n_sweeps, n_bb=run["n_bb"],
                             n_bf=run["n_bf"])
    return I_top, line


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("regular")
    ap.add_argument("voronoi")
    ap.add_argument("--out", required=True)
    ap.add_argument("--raster", type=int, nargs=3, default=None,
                    metavar=("NZ", "NX", "NY"))
    ap.add_argument("--mus", type=float, nargs="+", default=[1.0, 0.6, 0.2])
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from analysis.plots import brightness_temperature

    os.makedirs(args.out, exist_ok=True)
    runs = [_load(args.regular, args.raster),
            _load(args.voronoi, args.raster)]
    assert runs[0]["kind"] == "regular" and runs[1]["kind"] == "voronoi", \
        "pass the regular checkpoint first, the voronoi one second"

    # ---- convergence histories (plot_utils.jl:357-392 analog)
    fig, ax = plt.subplots(figsize=(6, 4), dpi=150)
    for run, style in zip(runs, ("o-", "s--")):
        ax.semilogy(np.arange(1, len(run["convergence"]) + 1),
                    run["convergence"], style, label=run["kind"], ms=3)
    ax.set_xlabel("iteration")
    ax.set_ylabel("max rel. change of S")
    ax.axhline(1e-3, color="k", lw=0.5, ls=":")
    ax.legend()
    ax.set_title("Lambda-iteration convergence")
    fig.savefig(os.path.join(args.out, "convergence.png"),
                bbox_inches="tight")
    plt.close(fig)

    summary = {"mus": args.mus, "profiles": {}}
    cubes = {}       # (kind, mu) -> (I_top, line)
    for run in runs:
        for mu in args.mus:
            cubes[(run["kind"], mu)] = synthesize_mu(run, mu)

    # ---- multi-mu spatially averaged profiles (plot_line.py analog)
    fig, axes = plt.subplots(1, 2, figsize=(11, 4), dpi=150, sharey=True)
    for ax, run in zip(axes, runs):
        kind = run["kind"]
        lam_nm = np.asarray(run["lam"]) * 1e9
        n_bb = run["n_bb"]
        order = np.argsort(lam_nm[:n_bb])
        for mu in args.mus:
            I_top, line = cubes[(kind, mu)]
            prof = I_top.mean(axis=(1, 2))
            ax.plot(lam_nm[:n_bb][order], prof[:n_bb][order],
                    label=f"mu={mu:g}")
            summary["profiles"][f"{kind}_mu{mu:g}"] = \
                prof[:n_bb][order].tolist()
        ax.set_xlabel("wavelength [nm]")
        ax.set_title(kind)
        ax.legend()
    axes[0].set_ylabel("mean intensity [kW m$^{-2}$ nm$^{-1}$]")
    fig.suptitle("Ly-alpha emergent profiles, centre-to-limb")
    fig.savefig(os.path.join(args.out, "profiles_multi_mu.png"),
                bbox_inches="tight")
    plt.close(fig)

    # ---- disk-centre images at line centre / wing / continuum
    # wing = bluest bb point (qwing = 600 Doppler widths); continuum =
    # first bf point beyond the bb window (plot_line.py's lambda picks)
    panels = []
    for run in runs:
        kind = run["kind"]
        I_top, line = cubes[(kind, 1.0)]
        lam = np.asarray(run["lam"])
        i_centre = int(np.argmin(np.abs(lam - line.lam0)))
        i_wing = 0
        i_cont = run["n_bb"] if len(lam) > run["n_bb"] else len(lam) - 1
        panels.append((kind, I_top, lam, (i_centre, i_wing, i_cont)))

    labels = ("line centre", "far wing", "continuum")
    fig, axes = plt.subplots(2, 3, figsize=(12, 7.5), dpi=150)
    for row, (kind, I_top, lam, idxs) in enumerate(panels):
        for col, (label, idx) in enumerate(zip(labels, idxs)):
            ax = axes[row, col]
            im = ax.imshow(I_top[idx].T, origin="lower", cmap="magma")
            ax.set_title(f"{kind}: {label}\n{lam[idx]*1e9:.3f} nm",
                         fontsize=9)
            fig.colorbar(im, ax=ax, shrink=0.8)
            ax.set_xticks([])
            ax.set_yticks([])
    fig.suptitle("Disk-centre Ly-alpha intensity [kW m$^{-2}$ nm$^{-1}$]")
    fig.savefig(os.path.join(args.out, "images_centre_wing_cont.png"),
                bbox_inches="tight")
    plt.close(fig)

    # ---- brightness-temperature maps at centre and wing
    fig, axes = plt.subplots(2, 2, figsize=(9, 7.5), dpi=150)
    for row, (kind, I_top, lam, (i_centre, i_wing, _)) in enumerate(panels):
        for col, (label, idx) in enumerate(
                zip(("centre", "wing"), (i_centre, i_wing))):
            Tb = brightness_temperature(I_top[idx], float(lam[idx]))
            ax = axes[row, col]
            im = ax.imshow(np.asarray(Tb).T, origin="lower",
                           cmap="inferno")
            ax.set_title(f"{kind}: T$_b$ {label}", fontsize=9)
            fig.colorbar(im, ax=ax, shrink=0.8)
            ax.set_xticks([])
            ax.set_yticks([])
    fig.savefig(os.path.join(args.out, "brightness_temperature.png"),
                bbox_inches="tight")
    plt.close(fig)

    # ---- relative-difference map at line centre (grid-representation
    # error, the test_interpolation analog on the emergent intensity)
    (k0, I0c, lam0, (ic0, _, _)) = panels[0]
    (k1, I1c, lam1, (ic1, _, _)) = panels[1]
    if I0c[ic0].shape == I1c[ic1].shape:
        rel = (I1c[ic1] - I0c[ic0]) / np.maximum(np.abs(I0c[ic0]), 1e-30)
        fig, ax = plt.subplots(figsize=(5.5, 4.5), dpi=150)
        im = ax.imshow(rel.T, origin="lower", cmap="RdBu_r",
                       vmin=-0.5, vmax=0.5)
        fig.colorbar(im, ax=ax, label="(voronoi - regular)/regular")
        ax.set_title("line-centre intensity: relative difference")
        ax.set_xticks([])
        ax.set_yticks([])
        fig.savefig(os.path.join(args.out, "relative_difference.png"),
                    bbox_inches="tight")
        plt.close(fig)
        summary["centre_rel_diff_rms"] = float(np.sqrt(np.mean(rel ** 2)))

    summary["iterations"] = {r["kind"]: int(len(r["convergence"]))
                             for r in runs}
    summary["final_diff"] = {r["kind"]: float(r["convergence"][-1])
                             for r in runs}
    summary["wall_seconds"] = {r["kind"]: r["time"] for r in runs}
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("iterations", "final_diff", "wall_seconds",
                       "centre_rel_diff_rms") if k in summary}))


if __name__ == "__main__":
    main()
