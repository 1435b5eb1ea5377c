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

    *** DESTRUCTIVE THROUGH THE AXON TUNNEL -- END-OF-RUN ONLY. ***
    Measured on this platform (analysis/exp_hbm_strand.py, round 5): a
    single failed allocation permanently wedges the remote client --
    after one RESOURCE_EXHAUSTED even a 1 GB allocation fails, and
    nothing recovers short of a fresh process.  The bisection
    deliberately drives allocations to failure, so calling this
    mid-run poisons everything after it (this, not buffer stranding,
    was round 4's "repeat passes exhaust HBM a fresh client sees as
    free").  Call it only after the last device work of the process,
    or use HbmLedger for non-destructive per-phase accounting.

    device.memory_stats() returns nulls through the axon tunnel, so
    this is still the only direct end-of-run measurement: bisect the
    largest f32 buffer that still allocates.
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


class HbmLedger:
    """Non-destructive per-phase HBM accounting (round-5 watermarks).

    The axon tunnel nulls memory_stats() and a failed allocation wedges
    the client (see probe_free_hbm), so mid-run watermarks must be a
    host-side MODEL: phases register the device buffers they hold
    (by array or byte count); the ledger tracks live and peak bytes per
    phase.  It counts what callers declare -- XLA temp buffers inside a
    program execution are not visible, so pair it with AOT
    memory_analysis numbers for the per-program temp and ONE
    destructive probe_free_hbm at end of run to calibrate.

        led = HbmLedger()
        led.hold("S_T", S_T); led.hold("geometry", nbytes=2.0e9)
        with led.phase("sweep_dir0"):
            ...
        led.drop("S_T")
        led.report()  # {"phases": {...}, "live_bytes": ..., ...}
    """

    def __init__(self):
        self._live = {}
        self._peak = 0
        self._phases = {}

    @staticmethod
    def _nb(a):
        import numpy as np
        return int(np.prod(a.shape)) * a.dtype.itemsize

    def hold(self, name, array=None, nbytes=None):
        self._live[name] = self._nb(array) if array is not None \
            else int(nbytes)
        self._peak = max(self._peak, self.live_bytes())

    def drop(self, *names):
        for n in names:
            self._live.pop(n, None)

    def live_bytes(self):
        return sum(self._live.values())

    @contextlib.contextmanager
    def phase(self, name, transient_bytes=0):
        """Record the live watermark across a phase; transient_bytes
        adds a caller-estimated in-program temp (argument-layout
        copies, chunk outputs) to the recorded peak."""
        t0 = time.time()
        base = self.live_bytes()
        try:
            yield self
        finally:
            peak = max(base, self.live_bytes()) + int(transient_bytes)
            self._peak = max(self._peak, peak)
            self._phases[name] = {
                "live_bytes_start": base,
                "live_bytes_end": self.live_bytes(),
                "modeled_peak_bytes": peak,
                "seconds": time.time() - t0,
            }

    def report(self):
        return {"phases": dict(self._phases),
                "live_bytes": self.live_bytes(),
                "modeled_peak_bytes": self._peak,
                "held": dict(self._live)}


def nan_guard(name, *arrays):
    """Host-side NaN watchdog mirroring the reference's convergence NaN
    check (lambda_iteration.jl:310-312)."""
    import numpy as np
    for i, a in enumerate(arrays):
        bad = ~np.isfinite(np.asarray(a))
        if bad.any():
            raise FloatingPointError(
                f"{name}: array {i} has {bad.sum()} non-finite values")
