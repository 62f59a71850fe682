#!/usr/bin/env python
"""Scaling-efficiency benchmark: sweep wall-time vs device count.

BASELINE.md: ">= 90% scaling efficiency 1 -> 2 hosts on the cylinder
rotational-flow omega-k diagram". On a multi-host pod run this under
`jax.distributed`; in dev environments it measures the same sharded pipeline
over a virtual CPU mesh (the work partition and collectives are identical -
only the interconnect differs).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_bench.py --device cpu --devices 1 2 4 8
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
    ap.add_argument("--n-omega", type=int, default=128)
    ap.add_argument("--n-k", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    if args.device:
        jax.config.update("jax_platforms", args.device)

    from eigensolver_tpu import cases
    from eigensolver_tpu.parallel import make_mesh, run_case_sharded
    from eigensolver_tpu.search import SearchConfig

    case = getattr(cases, args.case)()
    case = dataclasses.replace(case, n_k=args.n_k)
    cfg = SearchConfig(n_omega=args.n_omega, n_bisect=40,
                       scan_dtype="float32", polish_dtype="float32")

    results = []
    t1 = None
    for n in args.devices:
        mesh = make_mesh(n)
        run_case_sharded(case, mesh, cfg)           # compile warm-up
        walls = []
        for _ in range(args.repeats):
            t0 = time.time()
            rs, st = run_case_sharded(case, mesh, cfg)
            walls.append(time.time() - t0)
        wall = min(walls)
        if t1 is None:
            t1 = wall
        eff = t1 / (wall * n)
        results.append({"devices": n, "wall_s": round(wall, 3),
                        "roots": sum(rs.counts().values()),
                        "efficiency_vs_1dev": round(eff, 3)})
        print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
