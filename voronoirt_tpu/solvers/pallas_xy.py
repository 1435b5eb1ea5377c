"""Pallas TPU kernel for the xy plane-cut case of the regular sweep.

The XLA formulation of the xy case materializes 12 rolled copies per
z-step (4-point bilinear stencils of alpha/S/I,
sweep_regular._stencil_xy), ~17x above the HBM roofline.  This kernel
fuses the whole update -- stencil gathers, trapezoid dtau,
formal-solution weights, axpy -- into one VMEM pass per (z-plane,
lambda-block):

  I_t = e(dtau) * bil(I_p) + a(dtau) * bil(S_p) + b(dtau) * S_t,
  dtau = r/2 * (alpha_t + bil(alpha_p)).

The stencil is a unified 3x3 tap set with runtime offsets
ox = sxs + fx in (-1, 1), oy = sys + fy: taps at -1/0/+1 weighted
w(+1)=relu(o), w(-1)=relu(-o), w(0)=1-|o|.  Runtime offsets mean ONE
compiled Mosaic kernel serves every direction and z-step -- remote
Mosaic compiles are not covered by jax's persistent cache, so variant
count directly costs wall-clock at startup.

Semantics identical to sweep_regular._xy_step (taps with zero weight
drop out); tested in tests/test_pallas_march.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .formal import linear_weights


def _roll(A, shift, axis):
    """A[..., i+shift, ...] periodic (pltpu.roll, non-negative shifts)."""
    if shift == 0:
        return A
    return pltpu.roll(A, (-shift) % A.shape[axis], axis=axis)


def _xy_kernel(scal_ref, a_p, a_c, s_p, s_c, i_p, out):
    r = scal_ref[0]
    ox = scal_ref[1]
    oy = scal_ref[2]
    wx = (jnp.maximum(-ox, 0.0), 1.0 - jnp.abs(ox), jnp.maximum(ox, 0.0))
    wy = (jnp.maximum(-oy, 0.0), 1.0 - jnp.abs(oy), jnp.maximum(oy, 0.0))

    def bil(A):
        acc = None
        for ix, wxi in zip((-1, 0, 1), wx):
            Ax = _roll(A, ix, 1)
            for iy, wyi in zip((-1, 0, 1), wy):
                term = (wxi * wyi) * _roll(Ax, iy, 2)
                acc = term if acc is None else acc + term
        return acc

    dtau = r * (a_c[...] + bil(a_p[...])) * 0.5
    aw, bw, ew = linear_weights(dtau)
    out[...] = ew * bil(i_p[...]) + aw * bil(s_p[...]) + bw * s_c[...]


@functools.partial(jax.jit, static_argnames=("b_block", "interpret"))
def xy_plane_pallas(alpha_p, alpha_c, S_p, S_c, I_p, r, ox, oy, *,
                    b_block=8, interpret=False):
    """One z-plane of the xy case: (B, Nx, Ny) planes -> new I plane.

    r (path length) and the stencil offsets ox, oy are traced scalars
    (they vary with z spacing and direction).
    """
    B, nx, ny = alpha_p.shape
    while B % b_block:
        b_block -= 1
    grid = (B // b_block,)

    spec = pl.BlockSpec((b_block, nx, ny), lambda b: (b, 0, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)
    scal = jnp.stack([jnp.asarray(r, alpha_p.dtype),
                      jnp.asarray(ox, alpha_p.dtype),
                      jnp.asarray(oy, alpha_p.dtype)])

    return pl.pallas_call(
        _xy_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, nx, ny), alpha_p.dtype),
        interpret=interpret,
    )(scal, alpha_p, alpha_c, S_p, S_c, I_p)
