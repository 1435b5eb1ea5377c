#!/bin/bash
# Round-5 flagship science campaign (VERDICT #4): converged NLTE runs
# at the paper's flagship Voronoi site count with a matched regular
# run (same synthetic atmosphere), plus a deep-NLTE pair (boost 1e5)
# at the quarter-production scale, then the thesis figures.
# Sequential: the runs share one chip's HBM.
set -x
cd "$(dirname "$0")/.."

# 1. flagship Voronoi: 3,522,560 sites (compare_line.jl:64-74 scale)
VRT_HOIST_BUDGET_GB=1.5 VRT_TRACE_J= python drivers/line_nlte.py \
  --grid voronoi --n-sites 3522560 --atmos 192 128 128 \
  --voronoi-order wavefront --lambda-chunk 91 --rates-chunk 524288 \
  --f32 --out artifacts/run_voronoi_3.5M.h5 \
  > artifacts/run_voronoi_3.5M.log 2>&1

# 2. matched regular grid (same atmosphere the sites were sampled from)
python drivers/line_nlte.py \
  --grid regular --atmos 192 128 128 --lambda-chunk 16 --stream \
  --f32 --out artifacts/run_regular_192.h5 \
  > artifacts/run_regular_192.log 2>&1

# 3+4. deep-NLTE pair (boost 1e5 -> eps ~ 0.3, O(100) iterations)
VRT_HOIST_BUDGET_GB=1.5 python drivers/line_nlte.py \
  --grid voronoi --n-sites 442368 --atmos 192 128 128 \
  --voronoi-order wavefront --lambda-chunk 91 --rates-chunk 524288 \
  --f32 --boost 1e5 --out artifacts/run_voronoi_442k_deep.h5 \
  > artifacts/run_voronoi_442k_deep.log 2>&1

python drivers/line_nlte.py \
  --grid regular --atmos 192 128 128 --lambda-chunk 16 --stream \
  --f32 --boost 1e5 --out artifacts/run_regular_192_deep.h5 \
  > artifacts/run_regular_192_deep.log 2>&1

echo DONE
