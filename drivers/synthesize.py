"""Disk-centre image / spectrum synthesis from a saved NLTE run.

Reference parity: src/plot_utils.jl `plotter` (:298-354, rebuild S_lambda
and alpha_tot from the checkpointed populations) + `write_top_intensity`
(:99-140, re-run the formal solver per wavelength and write the emergent
intensity cube + wavelength grid as .npy for the Python analysis suite,
python/plot_line.py).  Voronoi checkpoints are rasterized first with the
inverse-distance resampler, like read_irregular (plot_utils.jl:252-287).

The reconstruction mirrors the reference bit-for-bit in structure:
  S_line from populations, S_cont = B_lambda(lam, T), continuum
  extinction frozen at line centre (the reference's fidelity trap),
  per-wavelength Voigt profiles with the LOS velocity of the chosen
  direction (-k), S_lambda = (a_l S_l + a_c S_c)/(a_l + a_c),
  alpha_tot = a_l + a_c, then one upward formal solution with the bottom
  S_lambda plane as boundary.  All wavelengths ride the sweep's batch
  axis in a single jitted formal solution (the reference forks a Julia
  thread per wavelength, plot_utils.jl:118,128).

Usage:
  python drivers/synthesize.py run.h5 --out DIR [--theta 180 --phi 0]
        [--raster NZ NX NY] [--no-plots]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from voronoirt_tpu.platform import setup as _platform_setup
_platform_setup(platform=os.environ.get("VRT_PLATFORM") or None, x64=True)

import numpy as np


def _direction(theta_deg, phi_deg):
    """k = [cos(theta), cos(phi) sin(theta), sin(phi) sin(theta)]
    (plot_utils.jl:113; theta > 90 deg means an upward sweep)."""
    th = np.deg2rad(theta_deg)
    ph = np.deg2rad(phi_deg)
    return np.array([np.cos(th), np.cos(ph) * np.sin(th),
                     np.sin(ph) * np.sin(th)])


class _RasterSites:
    """Minimal positions-only container for the resamplers."""

    def __init__(self, positions):
        self.positions = positions


def _load_regular(f):
    """Checkpoint -> (Atmosphere, populations, wavelength[m])."""
    from voronoirt_tpu.atmosphere import Atmosphere
    atmos = Atmosphere(
        z=np.asarray(f["z"]), x=np.asarray(f["x"]), y=np.asarray(f["y"]),
        temperature=np.asarray(f["temperature"]),
        electron_density=np.asarray(f["electron_density"]),
        hydrogen_populations=np.asarray(f["hydrogen_populations"]),
        velocity_z=np.asarray(f["velocity_z"]),
        velocity_x=np.asarray(f["velocity_x"]),
        velocity_y=np.asarray(f["velocity_y"]))
    pops = np.asarray(f["populations"])          # (nz, nx, ny, 3)
    lam = np.asarray(f["wavelength"]) * 1e-9     # nm on disk -> m
    return atmos, pops, lam


def _load_voronoi(f, raster):
    """Voronoi checkpoint -> rasterized (Atmosphere, populations, lam).

    Mirrors read_irregular (plot_utils.jl:252-287): reload per-site
    state, inverse-distance resample every field AND the NLTE populations
    onto a regular grid, then synthesize on that grid.
    """
    from voronoirt_tpu.atmosphere import Atmosphere
    from voronoirt_tpu.grid.interpolate import voronoi_to_raster_inv_dist

    positions = np.asarray(f["positions"]).T     # (n, 3) z,x,y
    bounds = np.asarray(f["boundaries"])         # z0 z1 x0 x1 y0 y1
    pops_sites = np.asarray(f["populations"])    # (n, 3)
    lam = np.asarray(f["wavelength"]) * 1e-9

    if raster is None:
        side = max(int(round(len(positions) ** (1.0 / 3.0))), 4)
        raster = (side, side, side)
    nz, nx, ny = raster
    z = np.linspace(bounds[0], bounds[1], nz)
    x = np.linspace(bounds[2], bounds[3], nx)
    y = np.linspace(bounds[4], bounds[5], ny)

    sites = _RasterSites(positions)
    field = {}
    for name in ("temperature", "electron_density", "hydrogen_populations",
                 "velocity_z", "velocity_x", "velocity_y"):
        field[name] = voronoi_to_raster_inv_dist(
            sites, z, x, y, np.asarray(f[name]))
    pops = voronoi_to_raster_inv_dist(sites, z, x, y, pops_sites.T)
    pops = np.moveaxis(pops, 0, -1)              # (nz, nx, ny, 3)
    atmos = Atmosphere(z=z, x=x, y=y, **field)
    return atmos, pops, lam


def synthesize(atmos, populations, lam, theta=180.0, phi=0.0, n_sweeps=3,
               gamma_natural=4.702e8, n_bb=51, n_bf=20):
    """Emergent intensity cube I(lam, x, y) [IUNIT] from saved populations.

    The plotter (plot_utils.jl:298-354) + write_top_intensity
    (:99-140) chain in one call.
    """
    import jax.numpy as jnp
    from voronoirt_tpu.physics import lyman_alpha_line
    from voronoirt_tpu.physics.atom import (alpha_line, compute_profile,
                                            line_of_sight_velocity,
                                            source_line)
    from voronoirt_tpu.physics.broadening import damping, gamma_constant
    from voronoirt_tpu.physics.lte import lte_populations
    from voronoirt_tpu.physics.opacity import (alpha_absorption,
                                               alpha_scattering)
    from voronoirt_tpu.physics.planck import B_lambda
    from voronoirt_tpu.solvers.sweep_regular import build_plan, sweep

    T = jnp.asarray(atmos.temperature)
    ne = jnp.asarray(atmos.electron_density)
    nH = jnp.asarray(atmos.hydrogen_populations)
    pops = jnp.asarray(populations)
    lam = jnp.asarray(lam)

    # Rebuild the line on this grid's temperature (Doppler widths);
    # wavelengths come from the file (authoritative over the resampled
    # grid in case of forced-odd bb-count adjustments).
    line = lyman_alpha_line(n_bb, n_bf, T)
    import dataclasses
    line = dataclasses.replace(line, lam=np.asarray(lam))

    S_l = source_line(line, pops)                       # (nz,nx,ny) IUNIT
    S_c = B_lambda(lam[:, None, None, None], T[None])   # (nlam,nz,nx,ny)

    lte = lte_populations(line, T, ne, nH)
    a_c = alpha_absorption(line.lam0, T, ne, lte[..., 0] + lte[..., 1],
                           lte[..., 2])
    a_c = a_c + alpha_scattering(line.lam0, ne, lte[..., 0])

    gam = gamma_constant(line, T, pops[..., 0] + pops[..., 1], ne,
                         gamma_natural)
    damp = damping(gam[None], lam[:, None, None, None], line.dlamD[None])

    k = _direction(theta, phi)
    v = jnp.asarray(atmos.velocity_zxy())
    v_los = line_of_sight_velocity(v, -k)
    profile = compute_profile(line, lam, damp, v_los)
    a_l = alpha_line(line, profile, pops[..., 1], pops[..., 0])

    S_lam = (a_l * S_l[None] + a_c[None] * S_c) / (a_l + a_c[None])
    a_tot = a_l + a_c[None]

    plan = build_plan(k, np.asarray(atmos.z), atmos.dx, atmos.dy, up=True)
    S_t = jnp.swapaxes(S_lam, 0, 1)                     # (nz,nlam,nx,ny)
    a_t = jnp.swapaxes(a_tot, 0, 1)
    I0 = S_lam[:, 0]                                    # bottom S plane
    I = sweep(plan, S_t, a_t, I0, n_sweeps=n_sweeps)
    I_top = np.asarray(jnp.swapaxes(I, 0, 1)[:, -1])    # (nlam, nx, ny)
    return I_top, line


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--out", required=True)
    ap.add_argument("--theta", type=float, default=180.0)
    ap.add_argument("--phi", type=float, default=0.0)
    ap.add_argument("--raster", type=int, nargs=3, default=None,
                    metavar=("NZ", "NX", "NY"))
    ap.add_argument("--no-plots", action="store_true")
    ap.add_argument("--n-sweeps", type=int, default=3)
    args = ap.parse_args()

    import h5py
    with h5py.File(args.checkpoint, "r") as f:
        if "positions" in f:
            kind = "voronoi"
            atmos, pops, lam = _load_voronoi(f, args.raster)
        else:
            kind = "regular"
            atmos, pops, lam = _load_regular(f)
        n_bb = int(np.asarray(f["n_bb"])[0])
        n_bf = int(np.asarray(f["n_bf"])[0])

    I_top, line = synthesize(atmos, pops, lam, theta=args.theta,
                             phi=args.phi, n_sweeps=args.n_sweeps,
                             n_bb=n_bb, n_bf=n_bf)

    os.makedirs(args.out, exist_ok=True)
    lam_nm = np.asarray(lam) * 1e9
    np.save(os.path.join(args.out, f"{kind}.npy"), I_top)
    np.save(os.path.join(args.out, f"{kind}_wavelength.npy"), lam_nm)

    # spatially averaged line profile + brightness-temperature maps
    from analysis.plots import brightness_temperature
    profile = I_top.mean(axis=(1, 2))
    np.save(os.path.join(args.out, f"{kind}_profile.npy"), profile)
    i_centre = int(np.argmin(np.abs(np.asarray(lam) - line.lam0)))
    i_wing = 0  # bluest bb wavelength = far wing (qwing=600 Doppler widths)
    Tb_centre = brightness_temperature(I_top[i_centre], float(lam[i_centre]))
    Tb_wing = brightness_temperature(I_top[i_wing], float(lam[i_wing]))
    np.save(os.path.join(args.out, f"{kind}_Tb_centre.npy"), Tb_centre)
    np.save(os.path.join(args.out, f"{kind}_Tb_wing.npy"), Tb_wing)

    if not args.no_plots:
        from analysis.plots import plot_top_intensity
        for label, idx in (("centre", i_centre), ("wing", i_wing)):
            plot_top_intensity(
                I_top[idx], atmos.x, atmos.y,
                out_png=os.path.join(args.out, f"{kind}_{label}.png"),
                title=f"{kind} {label} ({lam_nm[idx]:.4f} nm)")
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        order = np.argsort(lam_nm[:n_bb])
        fig, ax = plt.subplots(figsize=(6, 4), dpi=150)
        ax.plot(lam_nm[:n_bb][order], profile[:n_bb][order])
        ax.set_xlabel("wavelength [nm]")
        ax.set_ylabel("intensity [kW m$^{-2}$ nm$^{-1}$]")
        ax.set_title(f"{kind}: spatially averaged Ly-alpha profile")
        fig.savefig(os.path.join(args.out, f"{kind}_line_profile.png"),
                    bbox_inches="tight")
        plt.close(fig)

    print(json.dumps({
        "kind": kind, "n_lambda": int(I_top.shape[0]),
        "image_shape": list(I_top.shape),
        "I_centre_mean": float(I_top[i_centre].mean()),
        "I_wing_mean": float(I_top[i_wing].mean()),
        "Tb_centre_mean": float(np.nanmean(Tb_centre)),
        "lambda_centre_nm": float(lam_nm[i_centre]),
        "lambda_wing_nm": float(lam_nm[i_wing]),
    }))


if __name__ == "__main__":
    main()
