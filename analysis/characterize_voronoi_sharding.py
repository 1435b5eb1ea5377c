"""Characterize sharded-Voronoi memory + collective traffic (round-3
verdict ask #7).

The Voronoi sweep's slot gather (`jnp.take(I.T, slot_gather)`,
solvers/sweep_voronoi.py) indexes arbitrary sites, so when the site axis
is sharded over a mesh XLA must all-gather the intensity field before
every level scan.  This script quantifies that at >=5e5 sites on the
8-virtual-device CPU mesh:

  * per-device resident bytes of the sharded fields,
  * the collective ops GSPMD actually inserts (parsed from the compiled
    HLO: all-gather / all-reduce / collective-permute, with byte sizes),
  * one executed sharded sweep (it runs, result equals unsharded),

and records artifacts/VORONOI_SHARD_TRAFFIC.json.  The decision this
evidence supports (docs/PARITY.md "distribution"): the production
distribution for the irregular engine is lambda x angle sharding (each
device sweeps full-site fields for its share of the 12 x 91 ray batch --
embarrassingly parallel, no site gather across shards, 3.5e6-site
fields are only 14 MB/lambda); site-axis sharding remains a
correctness-level escape hatch for grids that exceed one chip's HBM,
where the measured all-gather volume below is the price.

Usage: python analysis/characterize_voronoi_sharding.py [--n-sites N]
"""

import argparse
import json
import os
import re
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

_DTYPE_BYTES = {"f32": 4, "f64": 8, "s32": 4, "s64": 8, "bf16": 2,
                "u32": 4, "u64": 8, "pred": 1, "f16": 2, "s8": 1, "u8": 1}


def _hlo_collectives(hlo_text):
    """Collective ops with output byte sizes from an HLO dump."""
    out = []
    pat = re.compile(
        r"(\w[\w.-]*)\s*=\s*((?:\([^)]*\)|\S+))\s+"
        r"(all-gather|all-reduce|all-to-all|collective-permute|"
        r"reduce-scatter)\b")
    shape_pat = re.compile(r"(\w+)\[([\d,]*)\]")
    for line in hlo_text.splitlines():
        m = pat.search(line)
        if not m:
            continue
        shape_str, op = m.group(2), m.group(3)
        nbytes = 0
        for dt, dims in shape_pat.findall(shape_str):
            el = _DTYPE_BYTES.get(dt)
            if el is None:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * el
        out.append({"op": op, "shape": shape_str, "bytes": nbytes})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-sites", type=int, default=524288)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--n-dev", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        _ROOT, "artifacts", "VORONOI_SHARD_TRAFFIC.json"))
    args = ap.parse_args()

    from voronoirt_tpu.platform import setup
    setup(platform="cpu", x64=False, n_cpu_devices=args.n_dev)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from voronoirt_tpu import synthetic_atmosphere
    from voronoirt_tpu.grid import build_sites, initialise_sites
    from voronoirt_tpu.grid.sampling import sample_sites
    from voronoirt_tpu.grid.voronoi import build_voronoi_plan
    from voronoirt_tpu.parallel import make_mesh
    from voronoirt_tpu.solvers.sweep_voronoi import sweep_voronoi

    n = args.n_sites - args.n_sites % args.n_dev
    B = args.chunk
    rec = {"n_sites": n, "chunk_B": B, "n_devices": args.n_dev}

    atmos = synthetic_atmosphere(nz=64, nx=32, ny=32, seed=5)
    pos = sample_sites(atmos, n, density="invNH_invT", seed=2022)
    bounds = (atmos.z[0], atmos.z[-1], atmos.x[0], atmos.x[-1],
              atmos.y[0], atmos.y[-1])
    t0 = time.time()
    sites = build_sites(pos, bounds, initialise_sites(pos, atmos))
    rec["tessellate_s"] = time.time() - t0

    # one steep + one grazing production direction
    from voronoirt_tpu.quadrature import get_quadrature
    quad = get_quadrature("ul7n12")
    mus = np.abs(np.asarray(quad.k)[:, 0])
    i_steep = int(np.argmax(mus))
    i_graze = int(np.argmin(mus))

    mesh = make_mesh((args.n_dev,), ("site",))
    sh_site = NamedSharding(mesh, P(None, "site"))   # fields are (B, n)
    rec["per_device_field_bytes"] = B * (n // args.n_dev) * 4
    rec["full_field_bytes"] = B * n * 4
    rec["directions"] = {}

    rng = np.random.default_rng(0)
    for name, i in (("steep", i_steep), ("grazing", i_graze)):
        k = np.asarray(quad.k[i])
        up = bool(quad.is_up[i])
        plan = build_voronoi_plan(sites, k, up=up, order="wavefront")
        S = jnp.asarray(rng.uniform(0.1, 1.0, (B, n)), jnp.float32)
        a = jnp.asarray(10.0 ** rng.uniform(-9, -5, (B, n)), jnp.float32)
        I0 = jnp.ones((B, len(plan.bc_sites)), jnp.float32)

        S_sh = jax.device_put(S, sh_site)
        a_sh = jax.device_put(a, sh_site)

        fn = jax.jit(lambda S_, a_, I0_: sweep_voronoi(plan, S_, a_, I0_))
        lowered = fn.lower(S_sh, a_sh, I0)
        compiled = lowered.compile()
        colls = _hlo_collectives(compiled.as_text())
        by_op = {}
        for c in colls:
            e = by_op.setdefault(c["op"], {"count": 0, "bytes": 0})
            e["count"] += 1
            e["bytes"] += c["bytes"]
        t0 = time.time()
        I_sh = np.asarray(fn(S_sh, a_sh, I0))
        sharded_s = time.time() - t0
        I_ref = np.asarray(sweep_voronoi(plan, S, a, I0))
        rec["directions"][name] = {
            "k": [float(v) for v in k], "up": up,
            "slot_rows": int(plan.exact_levels.size // plan.exact_levels.shape[1]
                             if plan.exact_levels is not None else 0),
            "collectives": by_op,
            "total_collective_bytes": int(sum(c["bytes"] for c in colls)),
            "sharded_run_s": sharded_s,
            "matches_unsharded": bool(
                np.allclose(I_sh, I_ref, rtol=1e-5, atol=1e-7)),
        }
        print(name, json.dumps(rec["directions"][name]))

    # analytic production note: lambda x angle sharding needs zero site
    # gathers; full-site f32 field at the flagship 3.5e6 sites:
    rec["production_note"] = {
        "flagship_full_field_bytes_per_lambda": 3522560 * 4,
        "distribution_of_record": "lambda x angle (no cross-shard gather)",
        "site_sharding_role": "escape hatch for grids exceeding one "
                              "chip's HBM; costs the all-gather volume "
                              "recorded above per sweep",
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
