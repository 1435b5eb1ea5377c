"""Formal solvers (L3): regular-grid plane sweeps + Voronoi wavefront."""

from .formal import linear_weights, trapezoidal
