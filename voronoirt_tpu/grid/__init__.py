"""Grids & geometry (L1) + native preprocessing bindings (L0)."""

from .neighbors import voronoi_neighbors, bfs_layers, BOTTOM_WALL, TOP_WALL
from .voronoi import (VoronoiSites, VoronoiPlan, build_sites,
                      build_voronoi_plan, delaunay_lines)
from .interpolate import (trilinear, initialise_sites, voronoi_to_raster_nn,
                          voronoi_to_raster_inv_dist)
from .sampling import rejection_sampling, sample_sites, DENSITIES
