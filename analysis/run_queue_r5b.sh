#!/bin/bash
# Round-5 remaining TPU queue (runs after the science campaign):
#   1. re-run the flagship 3.5M Voronoi science run (iteration-2 OOM
#      fixed: stale J dropped before each J pass)
#   2. 442k production bench artifact (headline-backing, chunk 91)
#   3. Pallas dependability measurement (subprocess-isolated)
set -x
cd "$(dirname "$0")/.."

# wait for the science campaign to finish
while pgrep -f "run_science_r5.sh" > /dev/null; do sleep 30; done

VRT_HOIST_BUDGET_GB=1.5 python drivers/line_nlte.py \
  --grid voronoi --n-sites 3522560 --atmos 192 128 128 \
  --voronoi-order wavefront --lambda-chunk 91 --rates-chunk 524288 \
  --f32 --out artifacts/run_voronoi_3.5M.h5 \
  > artifacts/run_voronoi_3.5M.log 2>&1

VRT_HOIST_BUDGET_GB=1.5 python analysis/bench_voronoi_production.py \
  --n-sites 442368 --chunk 91 --iter-chunk 91 \
  --hoist-gb-sweep 1.5 --hoist-gb-iter 1.5 \
  --out artifacts/BENCH_VORONOI_442k_r5.json \
  > artifacts/bench_voronoi_442k_r5.log 2>&1

python analysis/exp_pallas_status.py --timeout 900 \
  > artifacts/exp_pallas_status.log 2>&1

echo QUEUE_DONE
