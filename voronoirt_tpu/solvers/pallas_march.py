"""Pallas TPU kernel for the in-plane marching sweep (yz/xz cases).

The XLA lax.scan formulation re-reads every plane three times (the
n_sweeps passes) and materializes gathered copies, making the marching
cases HBM-bound (~165 ms per 192-plane sweep at B=16 on a v5e chip).
This kernel keeps all six planes VMEM-resident for the whole
n_sweeps x Nx march, so HBM sees each plane exactly once.

Layout: planes (Nx, B, Ny) float32 -- the march axis LEADS so every
column step slices a contiguous (B, Ny) tile.  The caller transposes
once around the whole z-scan (sweep_regular), not per plane.  The xz
case additionally swaps x<->y.  The lambda batch B is blocked via the
pallas grid so six planes fit VMEM.

Semantics identical to sweep_regular._march_step (the reference's
characteristics.jl:420-483 relaxation with its one-line buffer);
equality is tested in tests/test_pallas_march.py via interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .formal import linear_weights


def _roll_last(col, shift):
    """col[..., y+shift] periodic == jnp.roll(col, -shift) on the lane
    axis; pltpu.roll only takes non-negative shifts."""
    if shift == 0:
        return col
    n = col.shape[-1]
    return pltpu.roll(col, (-shift) % n, axis=col.ndim - 1)


def _march_kernel(wc_ref, a_p, a_c, s_p, s_c, i_p, out, buf,
                  *, nx, sign, s_base, f_line, r, n_sweeps, centre_prev):
    wc = wc_ref[0]
    wp = 1.0 - wc

    def yb(col):
        return ((1.0 - f_line) * _roll_last(col, s_base)
                + f_line * _roll_last(col, s_base + 1))

    buf[...] = jnp.zeros_like(buf)

    a_cen_plane = a_p if centre_prev else a_c
    s_cen_plane = s_p if centre_prev else s_c

    def step(n, _):
        i = n % nx
        if sign > 0:
            ix = i
            ixw = jnp.where(ix == nx - 1, 0, ix + 1)
        else:
            ix = nx - 1 - i
            ixw = jnp.where(ix == 0, nx - 1, ix - 1)

        a_pw = a_p[ixw]
        a_cw = a_c[ixw]
        s_pw = s_p[ixw]
        s_cw = s_c[ixw]
        i_pw = i_p[ixw]
        a_c0 = a_cen_plane[ix]
        s_c0 = s_cen_plane[ix]

        a_up = wp * yb(a_pw) + wc * yb(a_cw)
        dtau = r * (a_c0 + a_up) * 0.5
        aw, bw, ew = linear_weights(dtau)
        s_up = wp * yb(s_pw) + wc * yb(s_cw)
        i_up = wp * yb(i_pw) + wc * yb(buf[...])
        i_new = ew * i_up + aw * s_up + bw * s_c0
        out[ix] = i_new
        buf[...] = i_new
        return 0

    jax.lax.fori_loop(0, n_sweeps * nx, step, 0)


@functools.partial(
    jax.jit,
    static_argnames=("sign", "s_base", "f_line", "r", "n_sweeps",
                     "centre_prev", "b_block", "interpret"))
def march_plane_pallas(alpha_p, alpha_c, S_p, S_c, I_p, w_cur, *, sign,
                       s_base, f_line, r, n_sweeps, centre_prev=False,
                       b_block=8, interpret=False):
    """One z-plane of the marching sweep.

    Args:
      alpha_p..I_p: (Nx, B, Ny) planes, MARCH AXIS LEADING (prev-z /
        current-z extinction and source, prev-z intensity).
      w_cur: scalar z-interp weight of the current plane.
      sign: march direction (+1 ascending / -1 descending).
      s_base: orthogonal-axis stencil base shift (0 or -1).
      f_line: orthogonal-axis interpolation fraction (static).
      r: path length (static).
      centre_prev: read centre alpha/S from the prev plane (the xz_down
        reference quirk, characteristics.jl:794,804).
    Returns: (Nx, B, Ny) new intensity plane.
    """
    nx, B, ny = alpha_p.shape
    while B % b_block:
        b_block -= 1
    grid = (B // b_block,)

    spec = pl.BlockSpec((nx, b_block, ny), lambda b: (0, b, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)
    wc_arr = jnp.full((1,), w_cur, alpha_p.dtype)

    kernel = functools.partial(
        _march_kernel, nx=nx, sign=sign, s_base=s_base, f_line=f_line,
        r=r, n_sweeps=n_sweeps, centre_prev=centre_prev)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((nx, B, ny), alpha_p.dtype),
        scratch_shapes=[pltpu.VMEM((b_block, ny), alpha_p.dtype)],
        interpret=interpret,
    )(wc_arr, alpha_p, alpha_c, S_p, S_c, I_p)
