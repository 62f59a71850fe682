"""f32 sweep + f64 host refinement reaches ~1e-7 relative accuracy."""
import dataclasses

import numpy as np
import pytest

from eigensolver_tpu import cases
from eigensolver_tpu.search import SearchConfig
from eigensolver_tpu.sweep import run_case


@pytest.mark.slow
def test_refine_f64_tightens_f32_roots():
    case = cases.slab_density_photospheric(width=1e5)
    case = dataclasses.replace(
        case, n_k=3, k_min=1.0, k_max=2.0, speeds=(1.05, 1.17, 1.29),
        grid=dataclasses.replace(case.grid, n_interior=1024))
    cfg32 = SearchConfig(n_omega=128, n_bisect=40,
                         scan_dtype="float32", polish_dtype="float32")
    cfg64 = SearchConfig(n_omega=128, n_bisect=60)
    rs32, _ = run_case(case, cfg32, refine_f64=True)
    rs64, _ = run_case(case, cfg64)
    for name in rs64.branches:
        a = np.sort(rs32[name].omegas)
        b = np.sort(rs64[name].omegas)
        assert len(a) == len(b) > 0, (name, a, b)
        rel = np.max(np.abs(a - b) / b)
        assert rel < 2e-7, (name, rel)
