"""Device-mesh distribution of the Lambda iteration.

The reference's only parallelism is shared-memory Julia threads over
wavelengths (lambda_iteration.jl:30,91; SURVEY.md §2 parallelism
inventory).  The TPU-native equivalents here:

  * wavelength axis ("lam"): pure data parallelism -- each device owns a
    lambda block through profile/opacity/sweep/J; the only cross-shard
    reductions are the rate integrals (sum over lambda) and the
    convergence max, both emitted automatically by GSPMD from jnp
    reductions.
  * horizontal spatial axis ("y"): columnar domain decomposition.  The
    sweep stencils reach +-1 cell in y (jnp.roll), which GSPMD lowers to
    collective-permutes of one-column halos over ICI -- the halo-exchange
    design of SURVEY.md §5 "long-context analog" without hand-written
    NCCL-style code.  The sequential z march stays on-chip (the pipeline
    depth axis).
  * the BFS-layered Voronoi sweep shards its site axis the same way
    (gathers become all-gathers only for cross-shard upwind edges).

The angle axis is distributed separately (parallel/angles.py): each
direction compiles its own static sweep schedule, so angle parallelism
is MPMD round-robin over devices rather than a shard_map axis.

Usage: build a mesh, then `shard_regular(engine, mesh)` re-places the
engine's arrays with NamedShardings; every jitted step inherits the
placement.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes, axis_names=("lam", "y"), devices=None):
    """Create a Mesh, e.g. make_mesh((2, 4)) -> 2 lam-shards x 4 y-shards."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    total = int(np.prod(axis_sizes))
    if total > devices.size:
        raise ValueError(f"mesh {axis_sizes} needs {total} devices, "
                         f"have {devices.size}")
    grid = devices[:total].reshape(axis_sizes)
    return Mesh(grid, axis_names[: len(axis_sizes)])


def _put(x, mesh, spec):
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_regular(engine, mesh):
    """Re-place a RegularEngine's state on a ("lam", "y") mesh.

    Field layouts:  (nlam, nz, nx, ny) -> P("lam", None, None, "y")
                    (nz, nx, ny)       -> P(None, None, "y")
    Requires nlam % lam-shards == 0 and ny % y-shards == 0.
    """
    lam_ax = "lam" if "lam" in mesh.axis_names else None
    y_ax = "y" if "y" in mesh.axis_names else None

    engine.T = _put(engine.T, mesh, P(None, None, y_ax))
    engine.ne = _put(engine.ne, mesh, P(None, None, y_ax))
    engine.nH = _put(engine.nH, mesh, P(None, None, y_ax))
    engine.v = _put(engine.v, mesh, P(None, None, y_ax, None))
    engine.lte = _put(engine.lte, mesh, P(None, None, y_ax, None))
    engine.a_cont = _put(engine.a_cont, mesh, P(None, None, y_ax))
    engine.eps = _put(engine.eps, mesh, P(None, None, y_ax))
    engine.B0 = _put(engine.B0, mesh, P(lam_ax, None, None, y_ax))
    engine.C = {k: _put(v, mesh, P(None, None, y_ax))
                for k, v in engine.C.items()}
    engine.mesh = mesh
    return engine


def shard_voronoi(engine, mesh):
    """Re-place a VoronoiEngine's state: site axis on "y", lambda on "lam".

    Requires n_sites % y-shards == 0 (pad the site set when sampling).
    """
    lam_ax = "lam" if "lam" in mesh.axis_names else None
    y_ax = "y" if "y" in mesh.axis_names else None

    engine.T = _put(engine.T, mesh, P(y_ax))
    engine.ne = _put(engine.ne, mesh, P(y_ax))
    engine.nH = _put(engine.nH, mesh, P(y_ax))
    engine.v = _put(engine.v, mesh, P(y_ax, None))
    engine.lte = _put(engine.lte, mesh, P(y_ax, None))
    engine.a_cont = _put(engine.a_cont, mesh, P(y_ax))
    engine.eps = _put(engine.eps, mesh, P(y_ax))
    engine.B0 = _put(engine.B0, mesh, P(lam_ax, y_ax))
    engine.C = {k: _put(v, mesh, P(y_ax)) for k, v in engine.C.items()}
    engine.mesh = mesh
    return engine
