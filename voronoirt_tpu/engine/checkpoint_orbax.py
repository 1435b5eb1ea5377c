"""Orbax/tensorstore checkpoint backend (ROADMAP item 12).

Same engine-facing interface as CheckpointFile (create_* / write_state /
write_convergence / read_state / resume_iteration / write_time), so
`engine.run(checkpoint=...)` and `recover(...)` accept either backend.
Differences from the reference-schema HDF5 store:

  * each write_state lands in its own step directory (atomic renames --
    a killed run can never corrupt the last good checkpoint, unlike the
    in-place r+ HDF5 writes the reference uses, io.jl:58-153);
  * arrays go through tensorstore (zarr) with per-shard writes, so on a
    multi-host mesh every process writes only its addressable shards;
  * resume restores the exact saved iteration index instead of scanning
    a convergence vector for the first zero (recover_simulation.jl:46).

The grid/line metadata the reference stores (axes, scalars, wavelength
grid) stays the engine constructor's job on resume, exactly like the
reference re-derives it (recover_simulation.jl:213-277).
"""

from __future__ import annotations

import numpy as np


class OrbaxCheckpoint:
    """CheckpointManager-backed store of (populations, S, convergence).

    Args:
      path: checkpoint directory (created if needed).
      max_to_keep: retained steps (old ones garbage-collected).
      async_save: overlap the tensorstore write with the next
        Lambda-iteration's compute (the engine only synchronizes at the
        next save or on close()).
    """

    def __init__(self, path, max_to_keep=3, async_save=True):
        import orbax.checkpoint as ocp
        import os
        self.path = os.path.abspath(str(path))
        self._ocp = ocp
        self._mngr = ocp.CheckpointManager(
            self.path,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=async_save),
        )
        self._convergence = []
        self._maxiter = None
        self._iteration = 0

    # ------------------------------------------------------------ create

    def _create(self, maxiter):
        self._maxiter = maxiter
        self._convergence = [0.0] * (maxiter + 1)
        self._time = 0.0

    def create_regular(self, line, atmos, maxiter):
        self._create(maxiter)

    def create_voronoi(self, line, sites, maxiter):
        self._create(maxiter)

    # ------------------------------------------------------------- write

    def write_convergence(self, iteration, diff):
        if self._maxiter is None:
            self._create(max(iteration, 150))
        # grow dynamically: engine.run(checkpoint=...) never calls
        # create_*, so a cfg.maxiter beyond the guessed preallocation
        # must not silently drop entries (ADVICE r1)
        while iteration >= len(self._convergence):
            self._convergence.append(0.0)
        self._convergence[iteration] = float(diff)
        self._iteration = max(self._iteration, iteration)

    def write_state(self, populations, S):
        ocp = self._ocp
        state = {
            "populations": populations,
            "source_function": S,
            "convergence": np.asarray(self._convergence),
            "iteration": np.asarray(self._iteration),
            "time": np.asarray(getattr(self, "_time", 0.0)),
        }
        self._mngr.save(self._iteration, args=ocp.args.StandardSave(state))

    def write_time(self, seconds):
        self._time = float(seconds)

    def close(self):
        self._mngr.wait_until_finished()
        self._mngr.close()

    # -------------------------------------------------------------- read

    def read_state(self):
        ocp = self._ocp
        step = self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.path}")
        state = self._mngr.restore(step, args=ocp.args.StandardRestore())
        self._convergence = list(np.asarray(state["convergence"]))
        self._iteration = int(state["iteration"])
        self._maxiter = len(self._convergence) - 1
        return (np.asarray(state["populations"]),
                np.asarray(state["source_function"]),
                np.asarray(state["convergence"]))

    def resume_iteration(self):
        """Next loop index to run.  write_state during body i lands in
        step i+1 (the convergence slot written at that body's head), so
        the saved step IS the next body index -- unlike the HDF5 backend,
        which infers it by scanning the convergence vector."""
        if self._mngr.latest_step() is None:
            return 0
        self.read_state()
        return self._iteration


def recover_orbax(engine, path):
    """Resume a Lambda iteration from an orbax checkpoint directory."""
    from .lambda_iter import _run_iteration
    ckpt = OrbaxCheckpoint(path)
    pops, S, _ = ckpt.read_state()
    it = ckpt.resume_iteration()
    return _run_iteration(engine, checkpoint=ckpt, start_iteration=it,
                          S_init=S, populations_init=pops)
