#!/bin/bash
# Wait out a TPU-tunnel outage, then run the round-4 TPU queue:
#   1. 3.5M-site production Voronoi bench (headline, chunk 91)
#   2. convergence science runs + figures (run_science.sh)
cd "$(dirname "$0")/.."

echo "[chain] probing TPU..." >&2
for i in $(seq 1 60); do
    if timeout 240 python -c "
import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.cache/jax')
import jax, jax.numpy as jnp
assert float(jnp.sum(jnp.ones((64, 64)))) == 4096.0
" > /dev/null 2>&1; then
        echo "[chain] TPU alive after probe $i" >&2
        break
    fi
    echo "[chain] probe $i failed; sleeping" >&2
    sleep 90
done

echo "[chain] bench 3.5M c91" >&2
timeout 7200 python analysis/bench_voronoi_production.py \
    --chunk 91 --iter-chunk 91 --out BENCH_VORONOI.json \
    > artifacts/bench_voronoi_3.5M_c91f.log 2>&1
echo "[chain] bench exit: $?" >&2

echo "[chain] science runs" >&2
bash analysis/run_science.sh > artifacts/run_science.log 2>&1
echo "[chain] science exit: $?" >&2
