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


def _complex_case():
    case = cases.slab_flow_complex_coronal()
    return dataclasses.replace(case, n_k=4, k_min=0.3, k_max=0.9)


@pytest.mark.slow
def test_complex_checkpointed_matches_plain(tmp_path):
    """KH sweep with intra-run durability == the plain complex sweep
    (omega_im round-trips through the store's imaginary field)."""
    from eigensolver_tpu.sweep import run_case_complex, run_case_complex_checkpointed

    case = _complex_case()
    rs_plain, _ = run_case_complex(case, n_re=6, n_im=4, newton_iters=25,
                                   check_completeness=False)
    p = str(tmp_path / "kh.eigr")
    rs_ck, st = run_case_complex_checkpointed(
        case, checkpoint_path=p, k_block=2, n_re=6, n_im=4, newton_iters=25)
    for name in rs_plain.branches:
        np.testing.assert_allclose(
            np.sort(rs_ck[name].omegas), np.sort(rs_plain[name].omegas),
            rtol=1e-12)
        np.testing.assert_allclose(
            np.sort(rs_ck[name].omegas_imag),
            np.sort(rs_plain[name].omegas_imag), rtol=1e-12, atol=1e-15)


@pytest.mark.slow
def test_complex_resume_after_kill(tmp_path):
    """Crash mid-sweep (store closed after the first k-block only), then
    resume: the durable block is skipped and the final root set matches an
    uninterrupted run - the crash-safety the reference's KH scan lacks
    (`flow_multiprocessor_complex_coronal.py:1185` end-of-run pickle only)."""
    import dataclasses as dc

    from eigensolver_tpu.sweep import run_case_complex_checkpointed

    case = _complex_case()
    p = str(tmp_path / "kh.eigr")
    # simulate the crash: run ONLY the first 2 of 4 k values to completion
    half = dc.replace(case, k_values=tuple(np.asarray(case.k_grid())[:2]))
    rs_half, st_half = run_case_complex_checkpointed(
        half, checkpoint_path=p, k_block=2, n_re=6, n_im=4, newton_iters=25)
    assert st_half.n_candidates > 0
    # resume the FULL sweep against the same store
    rs_full, st_full = run_case_complex_checkpointed(
        case, checkpoint_path=p, k_block=2, n_re=6, n_im=4, newton_iters=25)
    # the durable first block was not re-evaluated
    assert st_full.n_candidates < st_half.n_candidates * 2 + 1
    # and a fresh uninterrupted run agrees
    rs_ref, _ = run_case_complex_checkpointed(
        case, checkpoint_path=str(tmp_path / "kh2.eigr"), k_block=2,
        n_re=6, n_im=4, newton_iters=25)
    for name in rs_ref.branches:
        np.testing.assert_allclose(
            np.sort(rs_full[name].omegas), np.sort(rs_ref[name].omegas),
            rtol=1e-12)
        np.testing.assert_allclose(
            np.sort(rs_full[name].omegas_imag),
            np.sort(rs_ref[name].omegas_imag), rtol=1e-12, atol=1e-15)
