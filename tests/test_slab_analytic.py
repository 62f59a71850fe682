"""Slab engine vs closed-form uniform-limit dispersion relations.

This is the reference's own validation strategy (SURVEY.md section 4.1): the
shooting engine is checked against the analytic tanh/tan relations of the
uniform slab (`Slab/Non uniform flow/Solver/flow_multiprocessor.py:117-127`).
Here the polished eigenvalues must match scipy-brentq roots of the analytic
relation to ~1e-6 relative.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import brentq

from eigensolver_tpu import cases
from eigensolver_tpu.physics.slab import SlabPhysics
from eigensolver_tpu.search import SearchConfig, bisect, collect, find_brackets, ladder_scan


def analytic_relation(rg, W, K, parity):
    """Uniform-slab (with uniform flow) tanh relation; surface + body in one
    complex-sqrt expression whose real part has the same zeros."""
    Wc = np.asarray(W, complex)
    Om_i = Wc - rg.U_i0
    Om_e = Wc - rg.U_e

    def msq(c2, a2, Om):
        cT2 = c2 * a2 / (c2 + a2) if (c2 + a2) else 0.0
        return (c2 - Om**2) * (a2 - Om**2) / ((c2 + a2) * (cT2 - Om**2))

    m0 = np.sqrt(msq(rg.c_i0**2, rg.vA_i0**2, Om_i))
    me = np.sqrt(msq(rg.c_e**2, rg.vA_e**2, Om_e))
    R1 = rg.rho_e / rg.rho_i0
    base = R1 * (rg.vA_e**2 - Om_e**2) * m0 / (me * (rg.vA_i0**2 - Om_i**2))
    th = np.tanh(K * m0)
    val = base * th + 1 if parity == 0 else base / th + 1
    return val.real


def _polished_roots(case, parity, v_lo, v_hi, k, n_omega=2001):
    ph = SlabPhysics.from_case(case)
    disp = jax.jit(jax.vmap(ph.make_dispersion(parity=parity)))
    W = np.linspace(v_lo, v_hi, n_omega)
    om = jnp.asarray(W * k)[None, :]
    ks = jnp.asarray([k])
    det, valid, _ = ladder_scan(disp, om, ks)
    br = find_brackets(om, ks, det, valid, max_per_row=16)
    pr = bisect(disp, br, n_iter=60)
    mask = np.asarray(pr.mask) & (np.asarray(pr.mismatch) < 0.5)
    return np.sort(np.asarray(pr.omega)[mask]) / k


@pytest.mark.parametrize("parity", [0, 1])
def test_uniform_photospheric_slab_matches_analytic(parity):
    case = cases.slab_density_photospheric(width=1e5)
    rg = case.regime
    k = 1.5
    # surface/fast window away from the cT accumulation zone
    got = _polished_roots(case, parity, 0.95, 1.29, k)
    want = []
    W = np.linspace(0.95, 1.29, 8001)
    vals = analytic_relation(rg, W, k, parity)
    s = np.sign(vals)
    for i in np.nonzero(s[:-1] * s[1:] < 0)[0]:
        r = brentq(lambda w: analytic_relation(rg, w, k, parity), W[i], W[i + 1],
                   xtol=1e-13)
        # keep genuine roots only (tanh-form has no poles in this window)
        if abs(analytic_relation(rg, r, k, parity)) < 1e-6:
            want.append(r)
    want = np.asarray(want)
    assert len(got) == len(want) > 0
    np.testing.assert_allclose(got, want, rtol=2e-6)


def test_uniform_flow_slab_doppler_shift():
    """External flow case (flow_multiprocessor.py): eigenvalues shift per the
    analytic Doppler-shifted relation."""
    case = cases.slab_flow_uniform_photospheric()
    rg = case.regime
    k = 1.0
    got = _polished_roots(case, 1, 0.35, 0.62, k)
    W = np.linspace(0.35, 0.62, 8001)
    vals = analytic_relation(rg, W, k, 1)
    s = np.sign(vals)
    want = []
    for i in np.nonzero(s[:-1] * s[1:] < 0)[0]:
        r = brentq(lambda w: analytic_relation(rg, w, k, 1), W[i], W[i + 1],
                   xtol=1e-13)
        if abs(analytic_relation(rg, r, k, 1)) < 1e-6:
            want.append(r)
    want = np.asarray(want)
    assert len(want) > 0 and len(got) > 0
    # every found root matches an analytic root; at most the deepest
    # accumulation-zone roots (spacing below ladder resolution) may be missed
    for g in got:
        assert np.min(np.abs(want - g)) / g < 2e-5
    assert len(got) >= len(want) - 2
