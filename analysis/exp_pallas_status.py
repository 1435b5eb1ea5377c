"""Pallas-xy dependability measurement (round-5 verdict ask #7).

Runs bench.py twice in SUBPROCESSES (a hung/wedged Mosaic compile must
not poison this process's TPU client): once on the default XLA path,
once with VRT_PALLAS=1 (the fused xy-plane kernel), each under a hard
wall timeout.  Records compile time, J-pass time and outcome to
artifacts/PALLAS_STATUS.json -- the committed evidence for whether the
Pallas path can be default-on (compile <= 60 s warm and no hang) or
must stay opt-in on this platform.

Usage: python analysis/exp_pallas_status.py [--timeout 600]
"""

import argparse
import json
import os
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(env_extra, timeout):
    env = dict(os.environ, **env_extra)
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(_ROOT, "bench.py")],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=_ROOT)
        wall = time.time() - t0
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        rec = json.loads(line[-1]) if line else None
        return {"outcome": "ok" if (p.returncode == 0 and rec) else
                "error", "returncode": p.returncode, "wall_s": wall,
                "result": rec,
                "stderr_tail": p.stderr[-2000:] if p.returncode else None}
    except subprocess.TimeoutExpired:
        return {"outcome": "timeout", "wall_s": time.time() - t0,
                "result": None}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=900.0)
    args = ap.parse_args()

    rec = {"timeout_s": args.timeout}
    rec["default_xla"] = run_bench({}, args.timeout)
    rec["pallas_xy"] = run_bench({"VRT_PALLAS": "1"}, args.timeout)

    d, pl = rec["default_xla"], rec["pallas_xy"]
    if pl["outcome"] == "ok" and d["outcome"] == "ok":
        sp = (d["result"]["seconds_per_J_pass"]
              / pl["result"]["seconds_per_J_pass"])
        rec["pallas_speedup_J_pass"] = sp
        rec["pallas_compile_s"] = pl["result"]["compile_seconds"]
        rec["verdict"] = (
            "default-on viable" if pl["result"]["compile_seconds"] <= 60
            and sp >= 1.0 else
            "opt-in: compile %.0f s, speedup %.2fx"
            % (pl["result"]["compile_seconds"], sp))
    else:
        rec["verdict"] = ("opt-in: pallas run outcome=%s after %.0f s "
                          "(Mosaic compiles run remotely on this "
                          "platform and are not persisted by the jax "
                          "cache)" % (pl["outcome"], pl["wall_s"]))
    out = os.path.join(_ROOT, "artifacts", "PALLAS_STATUS.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
