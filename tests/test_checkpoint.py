"""Crash-safe sweep checkpoint/resume (run_case_checkpointed + native store)."""
import dataclasses

import numpy as np
import pytest

from eigensolver_tpu import cases
from eigensolver_tpu.search import SearchConfig
from eigensolver_tpu.sweep import run_case, run_case_checkpointed


def _case():
    case = cases.slab_density_photospheric(width=1e5)
    return dataclasses.replace(
        case, n_k=6, k_min=1.0, k_max=3.0,
        speeds=(0.95, 1.05, 1.15, 1.29),
        grid=dataclasses.replace(case.grid, n_interior=512))


@pytest.mark.slow
def test_checkpointed_matches_plain(tmp_path):
    case = _case()
    cfg = SearchConfig(n_omega=96, n_bisect=45)
    rs_plain, _ = run_case(case, cfg)
    p = str(tmp_path / "sweep.eigr")
    rs_ck, st = run_case_checkpointed(case, cfg, checkpoint_path=p, k_block=2)
    for name in rs_plain.branches:
        np.testing.assert_allclose(
            np.sort(rs_ck[name].omegas), np.sort(rs_plain[name].omegas),
            rtol=1e-12)


@pytest.mark.slow
def test_resume_skips_durable_blocks(tmp_path):
    case = _case()
    cfg = SearchConfig(n_omega=96, n_bisect=45)
    p = str(tmp_path / "sweep.eigr")
    rs1, st1 = run_case_checkpointed(case, cfg, checkpoint_path=p, k_block=2)
    # second run: everything durable -> no new candidates evaluated
    rs2, st2 = run_case_checkpointed(case, cfg, checkpoint_path=p, k_block=2)
    assert st2.n_candidates == 0
    for name in rs1.branches:
        np.testing.assert_allclose(np.sort(rs2[name].omegas),
                                   np.sort(rs1[name].omegas), rtol=1e-12)
