"""Voronoi (irregular) grid: sites container and static sweep plans.

Reference parity: src/voronoi_utils.jl -- VoronoiSites struct (:7-28),
read_cell (:36-85), BFS layer ordering (:93-174), Delaunay lines
(:186-245), reduce_layers (:253-269), smallest_angle upwind selection
(:282-396) -- recast TPU-first: everything direction-dependent (the two
upwind neighbours, blend weights, path lengths, layer schedule) is
precompiled host-side into padded fixed-shape arrays (a `VoronoiPlan`),
so the device sweep is a pure gather/FMA pipeline (SURVEY.md §7).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .neighbors import voronoi_neighbors, bfs_layers, BOTTOM_WALL, TOP_WALL


@dataclasses.dataclass
class VoronoiSites:
    """Irregular-grid state (voronoi_utils.jl:7-28), SI units.

    positions: (n, 3) ordered (z, x, y); neighbours: (n, W+1) with
    column 0 = count then ids (0-based; -5/-6 walls); per-site physical
    fields as 1-D arrays.
    """
    positions: np.ndarray
    neighbours: np.ndarray
    delaunay_lines: np.ndarray   # (n, W, 3) unit vectors (z, x, y)
    layers_up: np.ndarray        # per-site BFS layer from the bottom wall
    layers_down: np.ndarray      # ... from the top wall
    temperature: np.ndarray
    electron_density: np.ndarray
    hydrogen_populations: np.ndarray
    velocity_z: np.ndarray
    velocity_x: np.ndarray
    velocity_y: np.ndarray
    bounds: tuple                # (z_min, z_max, x_min, x_max, y_min, y_max)

    @property
    def n(self):
        return len(self.positions)

    def velocity_zxy(self):
        return np.stack(
            [self.velocity_z, self.velocity_x, self.velocity_y], axis=-1)


def delaunay_lines(positions, neighbours, bounds):
    """Unit vectors site -> neighbour with x,y min-image wrap.

    Mirrors calc_Delaunay_lines (voronoi_utils.jl:186-245); the
    reference's pairwise around-the-box test is exactly the minimum-image
    convention, implemented here vectorized.
    """
    n, w1 = neighbours.shape
    W = w1 - 1
    z_min, z_max, x_min, x_max, y_min, y_max = bounds
    Lx, Ly = x_max - x_min, y_max - y_min

    idx = neighbours[:, 1:].astype(np.int64)
    valid = (np.arange(W)[None, :] < neighbours[:, :1]) & (idx >= 0)
    safe = np.where(valid, idx, 0)
    d = positions[safe] - positions[:, None, :]       # (n, W, 3) in (z,x,y)
    d[..., 1] -= Lx * np.round(d[..., 1] / Lx)
    d[..., 2] -= Ly * np.round(d[..., 2] / Ly)
    norm = np.linalg.norm(d, axis=-1)
    norm = np.where(norm > 0, norm, 1.0)
    lines = d / norm[..., None]
    lines[~valid] = 0.0
    return lines, valid


def build_sites(positions, bounds, fields, max_nb=32, n_threads=0):
    """Run the native tessellation + layering and assemble VoronoiSites.

    The in-process equivalent of write_arrays -> voro subprocess ->
    read_cell (SURVEY.md §3.1 "PROCESS BOUNDARY").
    """
    neighbours = voronoi_neighbors(positions, bounds, max_nb=max_nb,
                                   n_threads=n_threads)
    lines, _ = delaunay_lines(positions, neighbours, bounds)
    lay_up = bfs_layers(neighbours, BOTTOM_WALL)
    lay_dn = bfs_layers(neighbours, TOP_WALL)
    return VoronoiSites(
        positions=np.asarray(positions, dtype=np.float64),
        neighbours=neighbours, delaunay_lines=lines,
        layers_up=lay_up, layers_down=lay_dn,
        temperature=fields["temperature"],
        electron_density=fields["electron_density"],
        hydrogen_populations=fields["hydrogen_populations"],
        velocity_z=fields["velocity_z"],
        velocity_x=fields["velocity_x"],
        velocity_y=fields["velocity_y"],
        bounds=tuple(float(b) for b in bounds))


# ------------------------------------------------------------ sweep plan

@dataclasses.dataclass(frozen=True)
class VoronoiPlan:
    """Static per-direction sweep plan (padded, fixed shapes).

    layer_sites: (L, Wmax) int32 site ids per layer, padded with n
      (a dummy slot) -- layer 0 is the boundary layer (gets I0).
    upwind: (n, 2) the two most-upwind neighbour ids (smallest_angle,
      voronoi_utils.jl:360-396).
    weights: (n, 2) blend weights dot^p / sum dot^p
      (irregular_ray_tracing.jl:51).
    r: (n, 2) path lengths to the upwind sites; the reference uses the
      UNwrapped euclidean distance (irregular_ray_tracing.jl:66) -- that
      quirk is reproduced when compat='reference', min-image otherwise.
    bc_sites: (n_bc,) site ids of the boundary layer.
    """
    k: tuple
    up: bool
    layer_sites: np.ndarray
    upwind: np.ndarray
    weights: np.ndarray
    r: np.ndarray
    bc_sites: np.ndarray
    n: int


def build_voronoi_plan(sites: VoronoiSites, k, up, p=7.0,
                       compat="reference"):
    """Compile the static upwind/ordering plan for direction k.

    Upwind selection: for every site, the two neighbours whose Delaunay
    lines have the largest positive dot product with k; if the second
    best is <= 0 it is replaced by the first with zero weight
    (voronoi_utils.jl:390-393).
    """
    k = np.asarray(k, dtype=np.float64)
    n = sites.n
    nb = sites.neighbours
    W = nb.shape[1] - 1
    idx = nb[:, 1:].astype(np.int64)
    valid = (np.arange(W)[None, :] < nb[:, :1]) & (idx >= 0)

    dots = np.einsum("nwc,c->nw", sites.delaunay_lines, k)
    dots = np.where(valid, dots, -np.inf)

    # top-2 neighbours by dot product
    order = np.argsort(-dots, axis=1)
    i1 = order[:, 0]
    i2 = order[:, 1] if W > 1 else order[:, 0]
    ar = np.arange(n)
    d1 = dots[ar, i1]
    d2 = dots[ar, i2]
    up1 = np.where(valid[ar, i1], idx[ar, i1], 0)
    up2 = np.where(valid[ar, i2], idx[ar, i2], up1)

    # reference fallback: second upwind invalid if its dot <= 0
    bad2 = ~np.isfinite(d2) | (d2 <= 0.0)
    up2 = np.where(bad2, up1, up2)
    d2 = np.where(bad2, 0.0, d2)
    d1 = np.maximum(np.where(np.isfinite(d1), d1, 0.0), 0.0)

    w1p = d1 ** p
    w2p = d2 ** p
    tot = w1p + w2p
    tot = np.where(tot > 0, tot, 1.0)
    weights = np.stack([w1p / tot, w2p / tot], axis=1)

    # path lengths
    pos = sites.positions
    upwind = np.stack([up1, up2], axis=1).astype(np.int32)
    d_vec = pos[upwind] - pos[:, None, :]
    if compat != "reference":
        z_min, z_max, x_min, x_max, y_min, y_max = sites.bounds
        Lx, Ly = x_max - x_min, y_max - y_min
        d_vec[..., 1] -= Lx * np.round(d_vec[..., 1] / Lx)
        d_vec[..., 2] -= Ly * np.round(d_vec[..., 2] / Ly)
    r = np.linalg.norm(d_vec, axis=-1)

    layers = sites.layers_up if up else sites.layers_down
    L = int(layers.max())
    counts = np.bincount(layers, minlength=L + 1)
    Wmax = int(counts[2:].max()) if L >= 2 else 1
    layer_sites = np.full((max(L - 1, 0), Wmax), n, dtype=np.int32)
    for l in range(2, L + 1):
        ids = np.nonzero(layers == l)[0]
        layer_sites[l - 2, :len(ids)] = ids
    bc_sites = np.nonzero(layers == 1)[0].astype(np.int32)

    return VoronoiPlan(k=tuple(k), up=up, layer_sites=layer_sites,
                       upwind=upwind, weights=weights, r=r,
                       bc_sites=bc_sites, n=n)
