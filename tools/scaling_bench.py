#!/usr/bin/env python
"""Scaling-efficiency benchmark: sharded-sweep overhead vs device count.

BASELINE.md: ">= 90% scaling efficiency 1 -> 2 hosts on the cylinder
rotational-flow omega-k diagram". On a multi-host pod run this under
`jax.distributed` with real chips; in dev environments it runs the same
sharded pipeline over a VIRTUAL CPU mesh.

What a virtual mesh can honestly measure: all N "devices" timeshare the same
physical cores, so total compute throughput is constant and a speedup-based
efficiency (t1 / (t_n * n)) degenerates to 1/n by construction. What DOES
transfer to real hardware is the *sharding overhead*: the same total work,
partitioned N ways + the final all_gather/dedup collective, should cost the
same wall as the unsharded run. We therefore report

    efficiency(n) = wall(1 device) / wall(n devices)     (fixed total work)

which is exactly the partition-balance + collective-overhead factor that
multiplies ideal linear scaling on a real pod (the per-candidate work is
embarrassingly parallel; the only cross-device traffic is one root
all_gather of a few KB per sweep, `parallel.py`). Shard balance (max/min
rows per device) is reported alongside.

Usage (virtual 8-device CPU mesh, finishes in ~2-3 min):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_bench.py --device cpu --devices 1 2 4 8 \
      --json SCALING_r03.json
The default work size is trimmed (n_interior=512, n_omega=96, repeats=2)
so CI can run the full 1/2/4/8 ladder; absolute wall is not the metric -
the partition/collective overhead factor is.
"""
import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default=None)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--case", default="cylinder_twisted_photospheric")
    ap.add_argument("--n-omega", type=int, default=96)
    ap.add_argument("--n-k", type=int, default=16)
    ap.add_argument("--n-interior", type=int, default=512,
                    help="RK4 steps for the bench case (trimmed from the "
                         "production 2048: the scaling metric is partition "
                         "overhead, not integration accuracy)")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    if args.device:
        jax.config.update("jax_platforms", args.device)

    from eigensolver_tpu import cases
    from eigensolver_tpu.parallel import make_mesh, run_case_sharded
    from eigensolver_tpu.search import SearchConfig
    from eigensolver_tpu.sweep import build_ladders

    case = getattr(cases, args.case)()
    case = dataclasses.replace(
        case, n_k=args.n_k,
        grid=dataclasses.replace(case.grid, n_interior=args.n_interior))
    cfg = SearchConfig(n_omega=args.n_omega, n_bisect=40,
                       scan_dtype="float32", polish_dtype="float32")
    rows = build_ladders(case, n_omega=args.n_omega)[0].shape[0]

    results = []
    wall_1 = None
    for n in args.devices:
        mesh = make_mesh(n)
        run_case_sharded(case, mesh, cfg)           # compile warm-up
        walls = []
        for _ in range(args.repeats):
            t0 = time.time()
            rs, st = run_case_sharded(case, mesh, cfg)
            walls.append(time.time() - t0)
        wall = min(walls)
        if wall_1 is None:
            wall_1 = wall
        per_dev = [rows // n + (1 if i < rows % n else 0) for i in range(n)]
        results.append({
            "devices": n, "wall_s": round(wall, 3),
            "roots": sum(rs.counts().values()),
            "rows_total": rows,
            "rows_per_device_max_min": [max(per_dev), min(per_dev)],
            "sharding_efficiency": round(wall_1 / wall, 3),
        })
        print(json.dumps(results[-1]), flush=True)
    out = {
        "definition": ("fixed-total-work wall(1 dev)/wall(n dev) on a "
                       "virtual mesh = partition + collective overhead "
                       "factor; multiplies ideal linear scaling on real "
                       "chips (see module docstring)"),
        "case": args.case, "n_omega": args.n_omega, "n_k": args.n_k,
        "backend": jax.default_backend(),
        "n_physical_cores": __import__("os").cpu_count(),
        "results": results,
    }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"# wrote {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()
