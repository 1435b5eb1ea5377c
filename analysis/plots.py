"""Analysis / figure suite (L6).

Reference parity: the reference's Python analysis layer (python/*.py,
~1900 LoC of thesis figures) and the Julia-side exporters
(src/plot_utils.jl).  This module reproduces the load-bearing analyses
on this framework's artifacts (reference-schema HDF5 + .npy images):

  plot_searchlight       beam image + analytic circle overlay
                         (plot_utils.jl:25-59, python/plot_searchlight.py)
  plot_convergence       convergence history (plot_utils.jl:357-392,
                         python/plot_line.py convergence panels)
  plot_top_intensity     disk-centre intensity images
                         (plot_utils.jl:61-140, python/plot_LTE.py)
  line_profile           spatially averaged emergent line profile
                         (python/plot_line.py)
  brightness_temperature Planck inversion of intensity
                         (python/brightness_temperature.py:5-29)
  plot_source_function   S cuts vs height (python/plot_source.py)
  plot_grid_layers       site/layer structure (python/plot_grid.py,
                         plot_layers.py)
  tau_unity_height       tau=1 surface for vertical rays
                         (plot_utils.jl:434-576)
  scaling_plot           chip/thread scaling (python/plot_threads_time.py)

All figures are written as .png; every function also returns the plotted
arrays for programmatic use (and testability without a display).
"""

from __future__ import annotations

import numpy as np

from voronoirt_tpu.constants import h, c_0, k_B, IUNIT_SI


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def analytic_beam_center(k):
    """Translated beam centre mod the unit box (plot_utils.jl:35-47)."""
    xr = (0.5 - np.sign(k[0]) * k[1] / k[0]) % 1.0
    yr = (0.5 - np.sign(k[0]) * k[2] / k[0]) % 1.0
    return xr, yr


def plot_searchlight(k, x, y, I, R0, title, out_png=None):
    plt = _plt()
    xr, yr = analytic_beam_center(k)
    fig, ax = plt.subplots(dpi=150)
    ax.pcolormesh(x, y, I.T, vmin=0, vmax=1)
    th = np.linspace(0, 2 * np.pi, 500)
    ax.plot(xr + R0 * np.cos(th), yr + R0 * np.sin(th), "r", lw=2)
    ax.set(title=title, xlabel="x", ylabel="y", aspect="equal")
    if out_png:
        fig.savefig(out_png)
    plt.close(fig)
    return xr, yr


def plot_convergence(convergence, out_png=None, label=None):
    """log-scale max relative S change per iteration."""
    conv = np.asarray(convergence)
    conv = conv[conv > 0]
    if out_png:
        plt = _plt()
        fig, ax = plt.subplots(dpi=150)
        ax.semilogy(np.arange(1, len(conv) + 1), conv, "o-", label=label)
        ax.set(xlabel="iteration", ylabel="max relative change in S")
        if label:
            ax.legend()
        fig.savefig(out_png)
        plt.close(fig)
    return conv


def brightness_temperature(I_lam, lam):
    """Invert Planck: T_b such that B_lambda(lam, T_b) = I.

    I in IUNIT (kW m^-2 nm^-1); mirrors
    python/brightness_temperature.py:5-29.
    """
    I_si = np.asarray(I_lam) * IUNIT_SI
    arg = 1.0 + 2.0 * h * c_0**2 / (lam**5 * np.maximum(I_si, 1e-300))
    return h * c_0 / (lam * k_B * np.log(arg))


def line_profile(S_or_I, axis=None):
    """Spatially averaged profile over all non-wavelength axes."""
    arr = np.asarray(S_or_I)
    axes = tuple(range(1, arr.ndim)) if axis is None else axis
    return arr.mean(axis=axes)


def plot_top_intensity(I_image, x, y, out_png=None, title="disk centre"):
    if out_png:
        plt = _plt()
        fig, ax = plt.subplots(dpi=150)
        im = ax.pcolormesh(x / 1e6, y / 1e6, I_image.T)
        fig.colorbar(im, label="I [kW m$^{-2}$ nm$^{-1}$]")
        ax.set(title=title, xlabel="x [Mm]", ylabel="y [Mm]",
               aspect="equal")
        fig.savefig(out_png)
        plt.close(fig)
    return I_image


def plot_source_function(S, z, lam_index, out_png=None):
    """Horizontally averaged S(z) at one wavelength."""
    prof = np.asarray(S)[lam_index].mean(axis=(1, 2))
    if out_png:
        plt = _plt()
        fig, ax = plt.subplots(dpi=150)
        ax.semilogy(z / 1e6, prof)
        ax.set(xlabel="z [Mm]", ylabel="S [kW m$^{-2}$ nm$^{-1}$]")
        fig.savefig(out_png)
        plt.close(fig)
    return prof


def tau_unity_height(alpha, z):
    """Height where vertical optical depth (integrated from the top)
    reaches 1 (plot_utils.jl:434-520, vertical variant).

    alpha: (nz, nx, ny); returns (nx, ny) heights.
    """
    alpha = np.asarray(alpha)
    nz = len(z)
    # cumulative tau from the top, trapezoid (functions.jl cumtrapz)
    dz = np.diff(z)
    tau = np.zeros_like(alpha)
    for i in range(nz - 2, -1, -1):
        tau[i] = tau[i + 1] + 0.5 * dz[i] * (alpha[i] + alpha[i + 1])
    heights = np.empty(alpha.shape[1:])
    for ix in range(alpha.shape[1]):
        for iy in range(alpha.shape[2]):
            col = tau[:, ix, iy]
            idx = np.searchsorted(col[::-1], 1.0)
            idx = np.clip(nz - 1 - idx, 0, nz - 2)
            t0, t1 = col[idx + 1], col[idx]
            if t1 == t0:
                heights[ix, iy] = z[idx]
            else:
                f = (1.0 - t0) / (t1 - t0)
                heights[ix, iy] = z[idx + 1] + f * (z[idx] - z[idx + 1])
    return heights


def tau_unity_height_slanted(alpha, z, x, y, k):
    """Height where optical depth along a slanted ray reaches 1.

    Reference parity: plot_utils.jl:521-576 (write_tau_unity, slanted
    variant) -- march from the top along direction k, bilinearly
    sampling alpha at the ray's periodic-wrapped (x, y) per level and
    accumulating tau over the path length.  Two reference quirks are
    corrected here (documented, not reproduced): its x/y periodic wrap
    assigns to misspelled variables (plot_utils.jl:553,560 `x_mrx`), and
    its horizontal offset is not accumulated along the ray (each level
    samples one step from the ORIGINAL column instead of following the
    characteristic).

    alpha: (nz, nx, ny); z ascending; k = (kz, kx, ky) with kz < 0 for a
    ray traced downward from the top.  Returns (nx, ny) heights.
    """
    alpha = np.asarray(alpha)
    z = np.asarray(z)
    nz, nx, ny = alpha.shape
    dx = x[1] - x[0]
    dy = y[1] - y[0]
    Lx, Ly = nx * dx, ny * dy

    def sample(plane, ox, oy):
        """Bilinear at (x + ox, y + oy), periodic (uniform grid)."""
        fx, ix0 = np.modf(ox / dx % nx)
        fy, iy0 = np.modf(oy / dy % ny)
        ix0, iy0 = int(ix0), int(iy0)
        p = np.roll(plane, (-ix0, -iy0), axis=(0, 1))
        p1 = np.roll(p, -1, axis=0)
        py = (1 - fy) * p + fy * np.roll(p, -1, axis=1)
        p1y = (1 - fy) * p1 + fy * np.roll(p1, -1, axis=1)
        return (1 - fx) * py + fx * p1y

    # march from the top (z[-1]) downward; cumulative horizontal offset
    a_col = np.empty_like(alpha)
    a_col[0] = alpha[-1]
    path = np.zeros(nz)
    ox = oy = 0.0
    for kk in range(1, nz):
        dz = z[nz - kk] - z[nz - kk - 1]
        r = abs(dz / k[0])
        path[kk] = path[kk - 1] + r
        ox -= r * k[1]
        oy -= r * k[2]
        a_col[kk] = sample(alpha[nz - kk - 1], ox, oy)

    tau = np.zeros((nz, nx, ny))
    for kk in range(1, nz):
        tau[kk] = tau[kk - 1] + 0.5 * (path[kk] - path[kk - 1]) * (
            a_col[kk] + a_col[kk - 1])

    z_desc = z[::-1]
    heights = np.empty((nx, ny))
    for ix in range(nx):
        for iy in range(ny):
            col = tau[:, ix, iy]
            idx = int(np.clip(np.searchsorted(col, 1.0), 1, nz - 1))
            t0, t1 = col[idx - 1], col[idx]
            f = 0.0 if t1 == t0 else (1.0 - t0) / (t1 - t0)
            heights[ix, iy] = z_desc[idx - 1] + f * (z_desc[idx]
                                                     - z_desc[idx - 1])
    return heights


def plot_grid_layers(sites, out_png=None):
    """Layer counts and neighbour statistics (python/plot_layers.py)."""
    stats = dict(
        n_sites=sites.n,
        layers_up=int(sites.layers_up.max()),
        layers_down=int(sites.layers_down.max()),
        mean_neighbours=float(sites.neighbours[:, 0].mean()),
        max_neighbours=int(sites.neighbours[:, 0].max()),
    )
    if out_png:
        plt = _plt()
        fig, axes = plt.subplots(1, 2, figsize=(9, 3.5), dpi=150)
        axes[0].hist(sites.layers_up, bins=sites.layers_up.max())
        axes[0].set(xlabel="BFS layer (up)", ylabel="sites")
        axes[1].hist(sites.neighbours[:, 0], bins=30)
        axes[1].set(xlabel="neighbour count", ylabel="sites")
        fig.tight_layout()
        fig.savefig(out_png)
        plt.close(fig)
    return stats


def scaling_plot(counts, times, out_png=None, xlabel="chips"):
    """Scaling efficiency table/plot (python/plot_threads_time.py analog).

    Returns the parallel efficiency per entry."""
    counts = np.asarray(counts, dtype=float)
    times = np.asarray(times, dtype=float)
    speedup = times[0] / times
    eff = speedup / (counts / counts[0])
    if out_png:
        plt = _plt()
        fig, ax = plt.subplots(dpi=150)
        ax.plot(counts, speedup, "o-", label="measured")
        ax.plot(counts, counts / counts[0], "k--", label="ideal")
        ax.set(xlabel=xlabel, ylabel="speedup")
        ax.legend()
        fig.savefig(out_png)
        plt.close(fig)
    return eff
