"""Case-level sweep orchestration: config -> RootSet.

Replaces the reference's `if __name__ == '__main__'` process fan-out
(`multiprocessor_Inhomogeneous_method.py:777-835`; 70..1800 OS processes) with
one batched pipeline: the (k x speed-band) cell grid becomes ladder rows of a
single device-wide batch, optionally sharded over a `jax.sharding.Mesh`
(see `eigensolver_tpu.parallel`).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import CaseConfig, Geometry
from .physics.cylinder import CylinderPhysics
from .physics.slab import SlabPhysics
from .roots import RootBranch, RootSet, dedup_roots
from .search import SearchConfig, collect, search_rows

MODE_NAMES = {0: "sausage", 1: "kink"}


def make_physics(case: CaseConfig):
    if case.geometry == Geometry.SLAB:
        return SlabPhysics.from_case(case)
    return CylinderPhysics.from_case(case)


def make_dispersion(case: CaseConfig, mode: int, dtype=jnp.float64) -> Callable:
    ph = make_physics(case)
    if case.geometry == Geometry.SLAB:
        return ph.make_dispersion(parity=mode, dtype=dtype)
    return ph.make_dispersion(m=mode, dtype=dtype)


_DISP_CACHE: dict = {}


def make_dispersion_jitted(case: CaseConfig, mode: int, dtype) -> Callable:
    """jit(vmap(disp)) with caching keyed on the (hashable, frozen) case config
    - re-sweeping the same case never re-traces, so steady-state sweep wall
    excludes compilation (cases are frozen dataclasses, safe as dict keys)."""
    key = (case, mode, jnp.dtype(dtype).name)
    fn = _DISP_CACHE.get(key)
    if fn is None:
        fn = jax.jit(jax.vmap(make_dispersion(case, mode, dtype=dtype)))
        _DISP_CACHE[key] = fn
    return fn


def build_ladders(case: CaseConfig, n_omega: Optional[int] = None,
                  edge_shrink: float = 1e-3):
    """(rows, n_omega) omega ladders + (rows,) ks from the (k x band) grid.

    Bands are phase-speed windows: omega in [v_lo k, v_hi k], edges shrunk to
    avoid evaluating exactly on characteristic-speed singularities (the
    reference seeds `linspace(speeds[i] k, speeds[i+1] k, N)`,
    `multiprocessor_Inhomogeneous_method.py:790-793`).
    """
    n_omega = n_omega or case.grid.n_omega_ladder
    ks = np.asarray(case.k_grid())
    speeds = np.asarray(case.sorted_speeds())
    if len(speeds) < 2:
        raise ValueError(f"case {case.name} needs >= 2 speed band edges")
    rows_k = []
    rows_om = []
    for k in ks:
        for lo, hi in zip(speeds[:-1], speeds[1:]):
            gap = (hi - lo) * edge_shrink
            w = np.linspace(lo + gap, hi - gap, n_omega)
            rows_k.append(k)
            rows_om.append(w * k)
    return jnp.asarray(np.stack(rows_om)), jnp.asarray(np.array(rows_k))


@dataclasses.dataclass
class SweepStats:
    wall_s: float = 0.0
    n_candidates: int = 0
    n_roots: int = 0

    @property
    def roots_per_sec(self) -> float:
        return self.n_roots / self.wall_s if self.wall_s > 0 else 0.0

    @property
    def candidates_per_sec(self) -> float:
        return self.n_candidates / self.wall_s if self.wall_s > 0 else 0.0


def run_case(case: CaseConfig, search: Optional[SearchConfig] = None,
             modes=None, device=None) -> tuple[RootSet, SweepStats]:
    """Single-process sweep of one case. Returns (RootSet, SweepStats)."""
    search = search or SearchConfig(
        n_omega=case.grid.n_omega_ladder,
        n_bisect=case.grid.n_bisect,
    )
    modes = tuple(modes) if modes is not None else case.modes
    scan_dt = jnp.dtype(search.scan_dtype)
    polish_dt = jnp.dtype(search.polish_dtype)

    omegas, ks = build_ladders(case, search.n_omega)

    branches: Dict[str, RootBranch] = {}
    stats = SweepStats()
    t0 = time.time()
    for mode in modes:
        disp_scan = make_dispersion_jitted(case, mode, scan_dt)
        if polish_dt == scan_dt:
            disp_polish = disp_scan
        else:
            disp_polish = make_dispersion_jitted(case, mode, polish_dt)

        pr = search_rows(disp_scan, disp_polish,
                         omegas.astype(scan_dt), ks.astype(scan_dt), search)
        om, kk, mm = collect(pr)
        om, kk = dedup_roots(om, kk, rel_tol=case.tol.dedup_rel)
        name = MODE_NAMES.get(mode, f"m{mode}")
        branches[name] = RootBranch(omegas=om, ks=kk).sorted_by_k()
        stats.n_candidates += omegas.size
        stats.n_roots += len(om)
    stats.wall_s = time.time() - t0
    return RootSet(branches, case_name=case.name), stats
