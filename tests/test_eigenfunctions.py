"""Eigenfunction reconstruction validated against analytic uniform-limit mode
shapes (Bessel/trig forms) and interface continuity at converged roots."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.special import iv, jv, kv

from eigensolver_tpu import cases
from eigensolver_tpu.eigenfunctions import reconstruct_cylinder, reconstruct_slab
from eigensolver_tpu.search import BracketBatch, bisect
from eigensolver_tpu.sweep import make_dispersion


def _converge(case, mode, k, v_lo, v_hi):
    disp = jax.jit(jax.vmap(make_dispersion(case, mode)))
    br = BracketBatch(lo=jnp.array([v_lo * k]), hi=jnp.array([v_hi * k]),
                      k=jnp.array([k]), mask=jnp.array([True]))
    pr = bisect(disp, br, n_iter=60)
    assert float(pr.mismatch[0]) < 1e-6
    return float(pr.omega[0])


@pytest.mark.slow
def test_slab_flow_shear_eigenfunction_continuity():
    """Gaussian-flow slab (shear D(x)/coeff(x) interior, the form the
    dispersion path integrates - `flow_multiprocessor_coronal.py:317-356`):
    the reconstructed eigenfunction must be continuous in BOTH total pressure
    and displacement at x = 1 at a converged root. Fails if reconstruction
    integrates a different ODE than the determinant zeroed (round-1 bug)."""
    import dataclasses

    case = cases.slab_flow_gaussian_coronal(width=1.0, U_i0=0.35)
    k = 1.0
    disp = jax.jit(jax.vmap(make_dispersion(case, 1)))
    # locate the clean fast kink bracket (root at v ~ 1.607 for these params)
    v = np.linspace(1.5, 1.7, 801)
    res = disp(jnp.asarray(v * k), jnp.full(v.shape, k))
    det = np.asarray(res.det)
    mism = np.asarray(res.mismatch_pct)
    s = np.signbit(det)
    idx = np.nonzero((s[:-1] != s[1:]) & (np.minimum(mism[:-1], mism[1:]) < 50))[0]
    assert len(idx), "no kink bracket in the fast band"
    i = idx[0]
    om = _converge(case, 1, k, v[i], v[i + 1])
    n_int = case.grid.n_interior
    ef = reconstruct_slab(case, 1, om, k, n_interior=n_int)
    # boundary values: interior AT the x=1 grid point; exterior pulled back
    # to x=1 through its known decay law PT_e(x) = PT_e(1) exp(-sq (x-1))
    # (comparing adjacent samples instead would only measure grid spacing)
    from eigensolver_tpu.physics.slab import SlabPhysics
    ph = SlabPhysics.from_case(case)
    sq = np.sqrt(float(ph.exterior_m(om, k)))
    xr = ef.x[ef.x > 0]
    PTr = ef.P_T[ef.x > 0]
    xir = ef.xi_r[ef.x > 0]
    j_b = int(np.searchsorted(xr, 1.0, side="right")) - 1
    assert np.isclose(xr[j_b], 1.0)
    grow = np.exp(sq * (xr[j_b + 1] - 1.0))
    PT_e1 = PTr[j_b + 1] * grow
    xi_e1 = xir[j_b + 1] * grow
    scale = np.max(np.abs(PTr))
    assert abs(PT_e1 - PTr[j_b]) / scale < 1e-6, (PTr[j_b], PT_e1)
    assert abs(xi_e1 - xir[j_b]) / np.max(np.abs(xir)) < 1e-6


@pytest.mark.slow
def test_slab_flow_uniform_limit_matches_analytic():
    """width=1e5 Gaussian flow == uniform internal flow: the shear-form
    engine's root must satisfy the analytic Doppler-shifted tanh relation
    (`flow_multiprocessor.py:117-127`)."""
    from eigensolver_tpu.analytic import scan_relation, slab_relation

    case = cases.slab_flow_gaussian_coronal(width=1e5, U_i0=0.35)
    k = 1.0
    want = scan_relation(
        lambda v: slab_relation(case.regime, v, k, 1), 1.55, 1.72)
    assert len(want), "analytic relation has no root in the window"
    om = _converge(case, 1, k, 1.55, 1.72)
    rel = np.min(np.abs(om / k - want) / want)
    assert rel < 1e-6, (om / k, want)


def test_slab_kink_uniform_mode_shape():
    """Uniform slab kink surface mode: vx ~ cosh(m0 x) inside,
    exp decay outside."""
    case = cases.slab_density_photospheric(width=1e5)
    k = 1.5
    om = _converge(case, 1, k, 1.115, 1.13)
    ef = reconstruct_slab(case, 1, om, k)
    rg = case.regime
    m0 = np.sqrt((k**2 * rg.c_i0**2 - om**2) * (k**2 * rg.vA_i0**2 - om**2)
                 / ((rg.c_i0**2 + rg.vA_i0**2) * (k**2 * rg.cT_i0**2 - om**2)))
    inside = np.abs(ef.x) <= 1.0
    want = np.cosh(m0 * ef.x[inside])
    got = ef.vx[inside] / ef.vx[np.argmin(np.abs(ef.x))]
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.slow
def test_cylinder_kink_uniform_mode_shape():
    """Uniform tube kink: P ~ I_1(m_i r) inside, ~ K_1(sqrt(m_e) r) outside."""
    case = cases.cylinder_density_coronal(width=1e5)
    k = 1.0
    om = _converge(case, 1, k, 0.90, 0.92)   # fundamental kink ~0.905
    ef = reconstruct_cylinder(case, 1, om, k)
    rg = case.regime

    def msq(c2, a2):
        cT2 = c2 * a2 / (c2 + a2)
        return ((k**2 * c2 - om**2) * (k**2 * a2 - om**2)
                / ((c2 + a2) * (k**2 * cT2 - om**2)))

    mi2 = msq(rg.c_i0**2, rg.vA_i0**2)
    me2 = msq(rg.c_e**2, rg.vA_e**2)
    inside = ef.x <= 1.0
    r_in = ef.x[inside]
    # skip the axis vicinity: the reference's P(eps)=0 BC (replicated) makes
    # the numerical mode deviate from pure I_1 within a few eps of the axis
    sel = r_in > 0.05
    if mi2 > 0:
        want = iv(1, np.sqrt(mi2) * r_in[sel])
    else:
        want = jv(1, np.sqrt(-mi2) * r_in[sel])
    want = want / want[-1]          # normalise at r=1
    got = ef.P_T[inside][sel] / ef.P_T[inside][-1]
    np.testing.assert_allclose(got, want, rtol=2e-3)

    outside = ef.x > 1.0
    r_ex = ef.x[outside][:-5]
    want_e = kv(1, np.sqrt(me2) * r_ex) / kv(1, np.sqrt(me2))
    got_e = ef.P_T[outside][:-5]
    np.testing.assert_allclose(got_e, want_e, rtol=2e-2)


@pytest.mark.slow
def test_cylinder_derived_components_uniform_limit():
    """xi_phi = m P / (r rho (Om^2 - om_A^2)), xi_z = k c^2 P /
    ((c^2+vA^2) rho (Om^2 - om_c^2)) in the uniform no-flow limit."""
    case = cases.cylinder_density_coronal(width=1e5)
    k = 1.0
    om = _converge(case, 1, k, 0.90, 0.92)
    ef = reconstruct_cylinder(case, 1, om, k)
    rg = case.regime
    sel = (ef.x > 0.1) & (ef.x < 0.99)
    r = ef.x[sel]
    P = ef.P_T[sel]
    omA2 = k**2 * rg.vA_i0**2
    omc2 = k**2 * rg.cT_i0**2
    want_phi = (1 * P / r) / (rg.rho_i0 * (om**2 - omA2))
    np.testing.assert_allclose(ef.xi_phi[sel], want_phi, rtol=1e-8)
    want_z = (k * rg.c_i0**2 * P
              / ((rg.c_i0**2 + rg.vA_i0**2) * rg.rho_i0 * (om**2 - omc2)))
    np.testing.assert_allclose(ef.xi_z[sel], want_z, rtol=1e-8)
    # velocities: v = -Om xi in the static background
    np.testing.assert_allclose(ef.v_phi[sel], -om * ef.xi_phi[sel], rtol=1e-10)
    np.testing.assert_allclose(ef.v_r[sel], -om * ef.xi_r[sel], rtol=1e-10)
