"""Iteration engine (L4): NLTE Lambda iteration + checkpointing."""

from .lambda_iter import (RegularEngine, VoronoiEngine, NLTEResult,
                          frozen_setup)
