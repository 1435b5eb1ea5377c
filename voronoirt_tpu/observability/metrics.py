"""Observability: per-phase timings, throughput metrics, profiler traces.

Reference parity (SURVEY.md §5 "Tracing / profiling"): the reference
wraps each Lambda iteration in @time (lambda_iteration.jl:161,254),
whole runs in @timed, and stores total wall time in the HDF5 `time`
dataset.  Here: a structured PhaseTimer whose report feeds the output
store, plus jax.profiler hooks for device traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulates wall-clock per named phase.

    with timer.phase("sweep"): ...
    timer.report() -> {"sweep": {"total_s": ..., "count": ..., "mean_s": ...}}
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self._t0 = time.time()

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def add(self, name, seconds):
        self.totals[name] += seconds
        self.counts[name] += 1

    def report(self):
        out = {}
        for name, tot in self.totals.items():
            c = self.counts[name]
            out[name] = {"total_s": tot, "count": c, "mean_s": tot / c}
        out["_wall_s"] = time.time() - self._t0
        return out

    def dump(self, path):
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=1)


def throughput(n_points, n_angles, n_lambda, n_iterations, seconds):
    """grid-points * rays / s (the BASELINE.md north-star metric)."""
    return n_points * n_angles * n_lambda * n_iterations / seconds


@contextlib.contextmanager
def device_trace(log_dir):
    """jax.profiler trace context (view with TensorBoard/XProf)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def probe_free_hbm(upper_gb=16.0, resolution_mb=256):
    """Estimate free device memory by allocation bisection [bytes].

    device.memory_stats() returns nulls through the axon remote-TPU
    tunnel, so peak-HBM accounting is done the direct way: bisect the
    largest f32 buffer that still allocates.  Call at a measurement
    point (e.g. right after a production sweep, before operands are
    freed); peak usage ~= total HBM - returned value.  The probe buffer
    is freed before returning.  Allocation failures are caught per
    attempt, so a production run can call this without dying -- but
    fragmentation makes it a lower bound on free memory.
    """
    import jax
    import jax.numpy as jnp

    step = int(resolution_mb * 2 ** 20)
    lo, hi = 0, int(upper_gb * 2 ** 30) // step

    def fits(k):
        if k == 0:
            return True
        try:
            buf = jnp.zeros((k * step // 4,), jnp.float32)
            buf.block_until_ready()
            # a scalar readback forces materialization through the tunnel
            ok = bool(buf[-1] == 0.0)
            del buf
            return ok
        except Exception:
            return False

    while lo < hi:
        mid = (lo + hi + 1) // 2
        if fits(mid):
            lo = mid
        else:
            hi = mid - 1
    return lo * step


def nan_guard(name, *arrays):
    """Host-side NaN watchdog mirroring the reference's convergence NaN
    check (lambda_iteration.jl:310-312)."""
    import numpy as np
    for i, a in enumerate(arrays):
        bad = ~np.isfinite(np.asarray(a))
        if bad.any():
            raise FloatingPointError(
                f"{name}: array {i} has {bad.sum()} non-finite values")
