"""Pallas TPU kernel for the in-plane marching sweep (yz/xz cases).

The XLA lax.scan formulation of the marching cases pays per-step loop
overhead and HBM round-trips for every one-column update (256 columns x
3 sweeps x 191 planes of (B, Ny) slices); measured ~125 ms per sweep on
a v5e chip vs ~6 ms for the vectorized xy case.  This kernel runs the
whole plane's n_sweeps x Nx march inside one pallas_call with every
plane VMEM-resident, so each column step is a VPU-only operation.

Layout: planes (B, Nx, Ny) float32, marching over axis 1 ("x"), the
(B, Ny) line vectorized.  The xz case is served by transposing x<->y
outside (see sweep_regular._march_plane_fast).  The lambda batch B is
blocked via the pallas grid so six planes fit VMEM.

Semantics are identical to sweep_regular._march_step (the reference's
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

        a_pw = a_p[:, ixw, :]
        a_cw = a_c[:, ixw, :]
        s_pw = s_p[:, ixw, :]
        s_cw = s_c[:, ixw, :]
        i_pw = i_p[:, ixw, :]
        a_c0 = a_cen_plane[:, ix, :]
        s_c0 = s_cen_plane[:, ix, :]

        a_up = wp * yb(a_pw) + wc * yb(a_cw)
        dtau = r * (a_c0 + a_up) * 0.5
        aw, bw, ew = linear_weights(dtau)
        s_up = wp * yb(s_pw) + wc * yb(s_cw)
        i_up = wp * yb(i_pw) + wc * yb(buf[...])
        i_new = ew * i_up + aw * s_up + bw * s_c0
        out[:, ix, :] = i_new
        buf[...] = i_new
        return 0

    jax.lax.fori_loop(0, n_sweeps * nx, step, 0)


@functools.partial(
    jax.jit,
    static_argnames=("sign", "s_base", "f_line", "r", "n_sweeps",
                     "centre_prev", "b_block", "interpret"))
def march_plane_pallas(alpha_p, alpha_c, S_p, S_c, I_p, w_cur, *, sign,
                       s_base, f_line, r, n_sweeps, centre_prev=False,
                       b_block=4, interpret=False):
    """One z-plane of the marching sweep.

    Args:
      alpha_p..I_p: (B, Nx, Ny) planes (prev-z / current-z extinction and
        source, prev-z intensity).
      w_cur: scalar z-interp weight of the current plane.
      sign: march direction (+1 ascending / -1 descending).
      s_base: orthogonal-axis stencil base shift (0 or -1).
      f_line: orthogonal-axis interpolation fraction (static).
      r: path length (static).
      centre_prev: read centre alpha/S from the prev plane (the xz_down
        reference quirk, characteristics.jl:794,804).
    Returns: (B, Nx, Ny) new intensity plane.
    """
    B, nx, ny = alpha_p.shape
    while B % b_block:
        b_block -= 1
    grid = (B // b_block,)

    spec = pl.BlockSpec((b_block, nx, ny), lambda b: (b, 0, 0),
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
        out_shape=jax.ShapeDtypeStruct((B, nx, ny), alpha_p.dtype),
        scratch_shapes=[pltpu.VMEM((b_block, ny), alpha_p.dtype)],
        interpret=interpret,
    )(wc_arr, alpha_p, alpha_c, S_p, S_c, I_p)
