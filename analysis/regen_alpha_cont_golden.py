"""Regenerate tests/golden/alpha_cont_golden.npz.

Pins the CURRENT continuum-opacity recipe (voronoirt_tpu.physics.opacity:
alpha_absorption + alpha_scattering, the re-implementation of
src/radiation.jl:28-56) over the synthetic-atmosphere state distribution
at the wavelengths the NLTE chain actually hits (Ly-alpha core, a bf
wavelength, 500 nm continuum).

Run this ONLY on a deliberate recipe change, and say so in the commit
message -- the golden exists to catch *accidental* regressions of
alpha_absorption / alpha_scattering, which the end-to-end NLTE chain
goldens no longer see (they inject the fixture's frozen alpha_cont;
tests/test_nlte_parity.py::_inject_frozen).

Usage: VRT_PLATFORM=cpu python analysis/regen_alpha_cont_golden.py
"""

import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

from voronoirt_tpu import platform  # noqa: E402

platform.setup(platform=os.environ.get("VRT_PLATFORM", "cpu"))

import jax.numpy as jnp  # noqa: E402

from voronoirt_tpu import synthetic_atmosphere  # noqa: E402
from voronoirt_tpu.physics import lyman_alpha_line  # noqa: E402
from voronoirt_tpu.physics.lte import lte_populations  # noqa: E402
from voronoirt_tpu.physics.opacity import (alpha_absorption,  # noqa: E402
                                           alpha_scattering)

OUT = "tests/golden/alpha_cont_golden.npz"
LAMBDAS = np.array([121.568e-9, 102.572e-9, 500e-9])


def main():
    atmos = synthetic_atmosphere(nz=48, nx=8, ny=8, seed=3)
    T = jnp.asarray(np.asarray(atmos.temperature).ravel())
    n_e = jnp.asarray(np.asarray(atmos.electron_density).ravel())
    n_H = jnp.asarray(np.asarray(atmos.hydrogen_populations).ravel())
    line = lyman_alpha_line(5, 3, T)
    lte = lte_populations(line, T, n_e, n_H)
    n_h1 = lte[..., 0] + lte[..., 1]
    n_p = lte[..., 2]
    out = {"T": np.asarray(T), "n_e": np.asarray(n_e),
           "n_h1": np.asarray(n_h1), "n_p": np.asarray(n_p),
           "lambdas": LAMBDAS}
    for i, lam in enumerate(LAMBDAS):
        out[f"alpha_abs_{i}"] = np.asarray(
            alpha_absorption(lam, T, n_e, n_h1, n_p))
        out[f"alpha_sca_{i}"] = np.asarray(alpha_scattering(lam, n_e, n_h1))
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: {len(out)} arrays, "
          f"alpha_abs_0 range [{out['alpha_abs_0'].min():.3e}, "
          f"{out['alpha_abs_0'].max():.3e}]")


if __name__ == "__main__":
    main()
