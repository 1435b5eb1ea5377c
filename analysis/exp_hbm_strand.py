"""HBM stranding forensics through the axon tunnel (round-5 lead 0a).

Round 4's flagship OOM showed a signature no steady-state budget
explains: a c16 run with ~3 GB of residents OOM'd on a tiny op right
after probe_free_hbm reported 12.9 GB free, and repeat benchmark passes
exhausted memory a fresh client saw as free.  Two suspects:

  A. FAILED allocations strand: probe_free_hbm bisects by driving
     allocations to RESOURCE_EXHAUSTED; if the tunnel's error path
     leaks the partially-created buffer, the probe itself eats the
     HBM it reports as free.
  B. Alloc/free churn strands or fragments: repeated multi-GB
     alloc+free cycles (the per-direction a_tot / lean buffers) leave
     the allocator unable to serve later requests.

This experiment separates them with only SUCCESSFUL allocations as the
measurement instrument (a fixed-size canary that either fits or not):

  phase 1: canary ladder -> how much can we allocate fresh?
  phase 2: N cycles of alloc/free churn at ~2 GB -> canary after each.
  phase 3: one DELIBERATE failed allocation -> canary after.
  phase 4: donation churn (DUS into donated buffer) -> canary after.

Writes artifacts/HBM_STRAND.json.  Run on the real TPU (not CPU).
"""

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main():
    from voronoirt_tpu.platform import setup
    setup(platform=os.environ.get("VRT_PLATFORM") or None, x64=False,
          cache_dir=os.path.join(_ROOT, ".cache", "jax"))
    import jax
    import jax.numpy as jnp
    from functools import partial

    rec = {"device": str(jax.devices()[0]), "steps": []}
    GB = 1 << 30

    def log(step, **kw):
        entry = {"step": step, **kw}
        rec["steps"].append(entry)
        print(json.dumps(entry), flush=True)
        with open(os.path.join(_ROOT, "artifacts", "HBM_STRAND.json"),
                  "w") as f:
            json.dump(rec, f, indent=1)

    def try_alloc(nbytes):
        """Allocate nbytes, verify materialization, free.  True if it
        fit.  Catches the failure (this IS the suspected stranding
        event in phase 3)."""
        try:
            buf = jnp.zeros((nbytes // 4,), jnp.float32)
            ok = bool(buf[-1] == 0.0)
            del buf
            return ok
        except Exception:
            return False

    def canary(nbytes=6 * GB):
        """Success/failure of ONE fixed allocation -- measurement that
        never intentionally drives the allocator to failure beyond the
        single test."""
        t0 = time.time()
        ok = try_alloc(nbytes)
        return ok, time.time() - t0

    # phase 1: ladder of successes from below (stop at first failure)
    fit = 0
    for gb in (2, 4, 6, 8, 10, 12, 13, 14, 15):
        if try_alloc(gb * GB):
            fit = gb
        else:
            break
    log("fresh_ladder", max_fit_gb=fit)

    # phase 2: churn -- 12 cycles of 2 GB alloc/free (the a_tot
    # pattern), canary after each batch of 4
    @jax.jit
    def make(x):
        return x * 2.0

    for cycle in range(3):
        for _ in range(4):
            a = jnp.zeros((2 * GB // 4,), jnp.float32)
            b = make(a)
            float(b[0])
            del a, b
        ok, dt = canary()
        log("churn_canary", cycle=cycle, canary_6gb_ok=ok,
            seconds=round(dt, 2))

    # phase 2b: donation churn -- DUS into donated 2 GB buffer x 12
    @partial(jax.jit, donate_argnums=(0,))
    def dus(buf, chunk):
        return jax.lax.dynamic_update_slice(buf, chunk, (0,))

    buf = jnp.zeros((2 * GB // 4,), jnp.float32)
    chunk = jnp.ones((1024,), jnp.float32)
    for _ in range(12):
        buf = dus(buf, chunk)
    float(buf[0])
    del buf, chunk
    ok, dt = canary()
    log("donation_churn_canary", canary_6gb_ok=ok, seconds=round(dt, 2))

    # phase 3: ONE deliberate failed allocation (the probe_free_hbm
    # event), then canaries at descending sizes to see what survives
    failed_ok = try_alloc(15 * GB if fit >= 14 else (fit + 2) * GB)
    log("deliberate_overalloc", unexpectedly_fit=failed_ok)
    for gb in (6, 4, 2, 1):
        ok, dt = canary(gb * GB)
        log("post_failure_canary", size_gb=gb, ok=ok,
            seconds=round(dt, 2))

    # phase 4: repeat the failure a few times (bisection does ~6), then
    # canary -- cumulative stranding would show shrinking headroom
    for i in range(4):
        try_alloc(15 * GB)
    for gb in (6, 2):
        ok, dt = canary(gb * GB)
        log("post_repeated_failure_canary", size_gb=gb, ok=ok,
            seconds=round(dt, 2))

    # phase 5: ladder again -- final free headroom vs phase 1
    fit2 = 0
    for gb in (2, 4, 6, 8, 10, 12, 13, 14, 15):
        if try_alloc(gb * GB):
            fit2 = gb
        else:
            break
    log("final_ladder", max_fit_gb=fit2, fresh_fit_gb=fit)
    print(json.dumps({"fresh_gb": fit, "final_gb": fit2}))


if __name__ == "__main__":
    main()
