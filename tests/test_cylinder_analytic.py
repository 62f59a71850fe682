"""Cylinder engine vs the analytic uniform-tube Bessel dispersion relation
(Edwin & Roberts form): the reference validates only implicitly via the
width=1e5 uniform-limit runs (SURVEY.md section 4.2); here we compare polished
eigenvalues against scipy Bessel-function roots to ~1e-5 relative.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import brentq
from scipy.special import iv, jv, kv

from eigensolver_tpu import cases
from eigensolver_tpu.physics.cylinder import CylinderPhysics
from eigensolver_tpu.search import bisect, find_brackets, ladder_scan


def analytic_det(rg, W, K, m):
    om = W * K

    def msq(c2, a2, o):
        cT2 = c2 * a2 / (c2 + a2)
        return (K**2 * c2 - o**2) * (K**2 * a2 - o**2) / (
            (c2 + a2) * (K**2 * cT2 - o**2))

    mi2 = msq(rg.c_i0**2, rg.vA_i0**2, om)
    me2 = msq(rg.c_e**2, rg.vA_e**2, om)
    if me2 <= 0:
        return np.nan
    se = np.sqrt(me2)
    ext = se * (kv(m - 1, se) + kv(m + 1, se)) / (-2 * kv(m, se)) / (
        rg.rho_e * (om**2 - K**2 * rg.vA_e**2))
    if mi2 > 0:
        si = np.sqrt(mi2)
        intr = si * (iv(m - 1, si) + iv(m + 1, si)) / (2 * iv(m, si)) / (
            rg.rho_i0 * (om**2 - K**2 * rg.vA_i0**2))
    else:
        ni = np.sqrt(-mi2)
        intr = ni * (jv(m - 1, ni) - jv(m + 1, ni)) / (2 * jv(m, ni)) / (
            rg.rho_i0 * (om**2 - K**2 * rg.vA_i0**2))
    return intr - ext


@pytest.mark.parametrize("m", [0, 1])
@pytest.mark.slow
def test_uniform_coronal_cylinder_matches_bessel(m):
    case = cases.cylinder_density_coronal(width=1e5)
    rg = case.regime
    k = 1.0
    v_lo, v_hi = 0.92, 4.8   # fast-body window, above cT accumulation
    ph = CylinderPhysics.from_case(case)
    disp = jax.jit(jax.vmap(ph.make_dispersion(m=m)))
    W = np.linspace(v_lo, v_hi, 3001)
    om = jnp.asarray(W * k)[None, :]
    ks = jnp.asarray([k])
    det, valid, _ = ladder_scan(disp, om, ks)
    br = find_brackets(om, ks, det, valid, max_per_row=16)
    pr = bisect(disp, br, n_iter=60)
    mask = np.asarray(pr.mask) & (np.asarray(pr.mismatch) < 0.5)
    got = np.sort(np.asarray(pr.omega)[mask]) / k

    want = []
    vals = np.array([analytic_det(rg, w, k, m) for w in W])
    s = np.sign(vals)
    ok = np.isfinite(vals)
    for i in np.nonzero((s[:-1] * s[1:] < 0) & ok[:-1] & ok[1:])[0]:
        r = brentq(lambda w: analytic_det(rg, w, k, m), W[i], W[i + 1], xtol=1e-13)
        if abs(analytic_det(rg, r, k, m)) < 1e-5:  # drop J_m-zero pole crossings
            want.append(r)
    want = np.asarray(want)
    assert len(want) > 0
    # every analytic root is found by the engine to 1e-5 relative
    for r in want:
        d = np.min(np.abs(got - r)) / r
        assert d < 1e-5, (r, got)
