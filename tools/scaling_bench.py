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

    def timed_sweep(n_dev, sub_case):
        mesh = make_mesh(n_dev)
        run_case_sharded(sub_case, mesh, cfg)       # compile warm-up
        walls = []
        for _ in range(args.repeats):
            t0 = time.time()
            rs, st = run_case_sharded(sub_case, mesh, cfg)
            walls.append(time.time() - t0)
        return min(walls), rs

    # --- strong scaling: fixed TOTAL work, n devices ------------------------
    results = []
    wall_1 = None
    for n in args.devices:
        wall, rs = timed_sweep(n, case)
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

    # --- weak scaling: fixed work PER DEVICE (k grid scales with n) ---------
    # the closer stand-in for the BASELINE 1 -> 2 host bar: on a virtual
    # mesh the n devices timeshare fixed cores, so ideal weak behaviour is
    # wall(n) = n * wall(1); the reported overhead wall(n)/(n*wall(1)) is
    # therefore falsifiable in BOTH directions (partition/collective cost
    # pushes it above 1, batch amortisation of dispatch below 1) - unlike
    # the fixed-work column, which cannot fall under 1.0 here.
    weak_results = []
    weak_wall_1 = None
    for n in args.devices:
        sub = dataclasses.replace(case, n_k=args.n_k * n)
        wall, rs = timed_sweep(n, sub)
        if weak_wall_1 is None:
            weak_wall_1 = wall
        overhead = wall / (n * weak_wall_1)
        weak_results.append({
            "devices": n, "n_k": args.n_k * n, "wall_s": round(wall, 3),
            "roots": sum(rs.counts().values()),
            "weak_overhead": round(overhead, 3),
            "weak_efficiency": round(1.0 / overhead, 3),
        })
        print(json.dumps(weak_results[-1]), flush=True)

    out = {
        "definition": ("strong: fixed-total-work wall(1 dev)/wall(n dev) on "
                       "a virtual mesh = partition + collective overhead "
                       "factor; multiplies ideal linear scaling on real "
                       "chips. weak: fixed work PER device (n_k scales with "
                       "n); overhead = wall(n)/(n*wall(1)), ideal 1.0 on a "
                       "timeshared virtual mesh (see module docstring)"),
        "case": args.case, "n_omega": args.n_omega, "n_k": args.n_k,
        "backend": jax.default_backend(),
        "n_physical_cores": __import__("os").cpu_count(),
        "results": results,
        "weak_results": weak_results,
    }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"# wrote {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()
