"""Complex-omega (Kelvin-Helmholtz) search vs the analytic uniform-limit
dispersion relation with internal flow (the reference's complex case
`flow_multiprocessor_complex_coronal.py` at its shipped width=1e5, where the
Doppler tanh relation is exact and has genuinely complex roots)."""
import dataclasses

import numpy as np
import pytest

from eigensolver_tpu import cases
from eigensolver_tpu.sweep import run_case_complex


def _analytic_newton(rg, W0, K, n=60):
    R1 = rg.rho_e / rg.rho_i0

    def rel(W):
        Om_i = W - rg.U_i0
        Om_e = W - rg.U_e

        def msq(c2, a2, Om):
            cT2 = c2 * a2 / (c2 + a2) if (c2 + a2) > 0 else 0.0
            return (c2 - Om**2) * (a2 - Om**2) / ((c2 + a2) * (cT2 - Om**2))

        m0 = np.sqrt(np.complex128(msq(rg.c_i0**2, rg.vA_i0**2, Om_i)))
        me = np.sqrt(np.complex128(msq(rg.c_e**2, rg.vA_e**2, Om_e)))
        return (R1 * (rg.vA_e**2 - Om_e**2) * m0
                / (np.tanh(K * m0) * me * (rg.vA_i0**2 - Om_i**2)) + 1)

    W = np.complex128(W0)
    for _ in range(n):
        h = 1e-8
        f = rel(W)
        df = (rel(W + h) - rel(W - h)) / (2 * h)
        Wn = W - f / df
        if abs(Wn - W) < 1e-14:
            return Wn
        W = Wn
    return W


@pytest.mark.slow
def test_kh_growth_rate_matches_analytic():
    case = cases.slab_flow_complex_coronal()
    case = dataclasses.replace(case, n_k=1, k_min=0.5, k_max=0.5)
    rs, _ = run_case_complex(case, n_re=8, n_im=6, newton_iters=30)
    br = rs["kink"]
    grow = br.omegas_imag > 1e-3
    assert grow.any(), "no KH growth root found"
    i = int(np.argmax(br.omegas_imag))
    W_us = (br.omegas[i] + 1j * br.omegas_imag[i]) / br.ks[i]
    W_ref = _analytic_newton(case.regime, W_us, br.ks[i])
    assert abs(W_us - W_ref) < 2e-6, (W_us, W_ref)
    # conjugate partner also present (real-coefficient determinant)
    assert (br.omegas_imag < -1e-3).any()


@pytest.mark.slow
def test_kh_completeness_argument_principle_nonuniform():
    """Argument-principle audit on the NON-uniform (W=1) KH layer at 3 k
    values: every quantized upper-half-plane winding number must equal the
    accepted growing-root count inside the same rectangle (completeness of
    the Newton sweep off the uniform limit, where no analytic relation
    exists - the regime the reference's complex solver works in,
    `flow_multiprocessor_complex_coronal.py:360-503`)."""
    case = cases.slab_flow_complex_coronal(width=1.0)
    case = dataclasses.replace(case, n_k=3, k_min=0.4, k_max=1.2)
    rs, st = run_case_complex(case, n_re=10, n_im=8, newton_iters=30)
    comp = st.completeness
    assert comp is not None and comp["cells"] == 3 * 3
    assert comp["checked"] >= 6, comp
    assert comp["missed"] == 0, comp
    assert comp["agree"] == comp["checked"], comp


@pytest.mark.slow
def test_kh_completeness_counts_the_uniform_grower():
    """Positive control: in the uniform limit where the analytic KH grower
    exists (test above), the audit's winding number must actually see it -
    total enclosed zeros across cells >= 1 and all quantized cells agree."""
    case = cases.slab_flow_complex_coronal()
    case = dataclasses.replace(case, n_k=1, k_min=0.5, k_max=0.5)
    rs, st = run_case_complex(case, n_re=8, n_im=6, newton_iters=30)
    br = rs["kink"]
    assert (br.omegas_imag > 1e-3).any()
    comp = st.completeness
    assert comp["checked"] >= 1
    assert comp["agree"] == comp["checked"], comp
    assert comp["missed"] == 0, comp


@pytest.mark.slow
def test_kh_stable_below_threshold():
    """With weak flow the same search finds no growing modes."""
    case = cases.slab_flow_complex_coronal(U_i0=0.1)
    case = dataclasses.replace(case, n_k=1, k_min=0.5, k_max=0.5)
    rs, _ = run_case_complex(case, n_re=6, n_im=4, newton_iters=30)
    br = rs["kink"]
    assert not (np.abs(br.omegas_imag) > 1e-4).any()


@pytest.mark.slow
def test_kh_backward_modes_mirror_under_flow_reversal():
    """Acceptance is sign-symmetric in Re(omega): reversing the flow
    (U -> -U) mirrors the spectrum omega -> -conj(omega), so the backward
    (Re < 0) roots of the reversed case must reproduce the forward roots
    of the original. Guards the r04 defect where `om.real > 0` acceptance
    made the (-0.5, 0) seed band structurally dead
    (`flow_multiprocessor_complex_coronal.py:231,1127` seeds it too)."""
    case = cases.slab_flow_complex_coronal()
    case = dataclasses.replace(case, n_k=1, k_min=0.5, k_max=0.5)
    rs_f, _ = run_case_complex(case, n_re=8, n_im=6, newton_iters=30)

    rg = case.regime
    rg_rev = dataclasses.replace(rg, U_i0=-rg.U_i0, U_e=-rg.U_e)
    case_rev = dataclasses.replace(
        case, regime=rg_rev,
        speeds=tuple(sorted(-s for s in case.speeds)))
    rs_b, _ = run_case_complex(case_rev, n_re=8, n_im=6, newton_iters=30)

    fwd = rs_f["kink"]
    bwd = rs_b["kink"]
    grow_f = fwd.omegas[fwd.omegas_imag > 1e-3]
    grow_b = bwd.omegas[bwd.omegas_imag > 1e-3]
    assert len(grow_f) and len(grow_b), (len(fwd), len(bwd))
    # every forward grower has a mirrored backward twin (Re negated)
    for om in grow_f:
        assert np.min(np.abs(grow_b + om)) < 1e-5 * max(1.0, abs(om)), \
            (om, grow_b)
    # and the mirrored roots genuinely sit at Re < 0 - impossible before
    # the sign-symmetric acceptance fix
    assert (grow_b < 0).all()
