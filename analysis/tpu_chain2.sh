#!/bin/bash
# Post-headline TPU queue: regular-grid production-shape chunk tuning
# (round-4 verdict ask #5) + the final headline bench.py line.
cd "$(dirname "$0")/.."

echo "[chain2] regular-shape iteration bench, chunk 6" >&2
timeout 5400 python analysis/bench_iteration_reference_shape.py --chunk 6 \
    --out artifacts/BENCH_ITERATION_c6.json \
    > artifacts/bench_iteration_c6.log 2>&1
echo "[chain2] c6 exit: $?" >&2

# promote whichever chunk wins to the headline artifact
python - <<'EOF'
import json, shutil
best = None
for path in ("artifacts/BENCH_ITERATION.json",
             "artifacts/BENCH_ITERATION_c6.json"):
    try:
        with open(path) as f:
            rec = json.load(f)
        t = rec["iteration_seconds_measured"]
        if best is None or t < best[0]:
            best = (t, path)
    except Exception:
        pass
if best and best[1] != "artifacts/BENCH_ITERATION.json":
    shutil.copy(best[1], "artifacts/BENCH_ITERATION.json")
print("headline iteration:", best)
EOF

echo "[chain2] final bench.py" >&2
timeout 3600 python bench.py > artifacts/bench_final.json 2> artifacts/bench_final.log
echo "[chain2] bench exit: $?" >&2
tail -1 artifacts/bench_final.json
