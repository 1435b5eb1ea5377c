"""Pallas TPU kernel for the xy plane-cut case of the regular sweep.

The XLA formulation of the xy case builds 12 rolled copies per z-step
(4-point bilinear stencils of alpha/S/I, sweep_regular._stencil_xy),
measured ~17x above the HBM roofline.  This kernel fuses the whole
update -- stencil gathers, trapezoid dtau, formal-solution weights,
axpy -- into one VMEM pass per (z-plane, lambda-block):

  I_t = e(dtau) * bil(I_p) + a(dtau) * bil(S_p) + b(dtau) * S_t,
  dtau = r/2 * (alpha_t + bil(alpha_p)).

Shifts are periodic rolls on the sublane (x) and lane (y) axes of
(b_block, Nx, Ny) VMEM blocks.  Semantics identical to
sweep_regular._xy_step; tested in tests/test_pallas_march.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .formal import linear_weights


def _shift2(A, sx, sy):
    """A[:, x+sx, y+sy] with periodic wrap (pltpu.roll, shifts >= 0)."""
    if sx:
        A = pltpu.roll(A, (-sx) % A.shape[1], axis=1)
    if sy:
        A = pltpu.roll(A, (-sy) % A.shape[2], axis=2)
    return A


def _xy_kernel(scal_ref, a_p, a_c, s_p, s_c, i_p, out, *, sxs, sys):
    r = scal_ref[0]
    fx = scal_ref[1]
    fy = scal_ref[2]
    w00 = (1.0 - fx) * (1.0 - fy)
    w01 = (1.0 - fx) * fy
    w10 = fx * (1.0 - fy)
    w11 = fx * fy

    def bil(A):
        return (w00 * _shift2(A, sxs, sys) + w01 * _shift2(A, sxs, sys + 1)
                + w10 * _shift2(A, sxs + 1, sys)
                + w11 * _shift2(A, sxs + 1, sys + 1))

    dtau = r * (a_c[...] + bil(a_p[...])) * 0.5
    aw, bw, ew = linear_weights(dtau)
    out[...] = ew * bil(i_p[...]) + aw * bil(s_p[...]) + bw * s_c[...]


@functools.partial(jax.jit, static_argnames=("sxs", "sys", "b_block",
                                             "interpret"))
def xy_plane_pallas(alpha_p, alpha_c, S_p, S_c, I_p, r, fx, fy, *, sxs,
                    sys, b_block=8, interpret=False):
    """One z-plane of the xy case: (B, Nx, Ny) planes -> new I plane.

    r/fx/fy are per-step traced scalars (they vary with the z spacing);
    sxs/sys are the static stencil base shifts.
    """
    B, nx, ny = alpha_p.shape
    while B % b_block:
        b_block -= 1
    grid = (B // b_block,)

    spec = pl.BlockSpec((b_block, nx, ny), lambda b: (b, 0, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)
    scal = jnp.stack([jnp.asarray(r, alpha_p.dtype),
                      jnp.asarray(fx, alpha_p.dtype),
                      jnp.asarray(fy, alpha_p.dtype)])

    kernel = functools.partial(_xy_kernel, sxs=sxs, sys=sys)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, nx, ny), alpha_p.dtype),
        interpret=interpret,
    )(scal, alpha_p, alpha_c, S_p, S_c, I_p)
