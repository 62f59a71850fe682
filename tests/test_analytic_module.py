"""Public `analytic` module: uniform-limit relations, scanner, overlay data.

The module is the productised form of the reference's validation machinery
(`flow_multiprocessor.py:117-276`); these tests pin it against scipy-brentq
ground truth and against the solver engine in the uniform limit.
"""
import numpy as np
import pytest
from scipy.optimize import brentq

from eigensolver_tpu import cases
from eigensolver_tpu.analytic import (
    analytic_curves,
    cylinder_relation,
    scan_relation,
    slab_relation,
)


def test_scan_matches_brentq_slab():
    rg = cases.slab_density_photospheric(width=1e5).regime
    k = 1.5

    def f(v):
        return slab_relation(rg, v, k, 0)

    got = scan_relation(f, 0.95, 1.29)
    s = np.sign(f(np.linspace(0.95, 1.29, 8001)))
    W = np.linspace(0.95, 1.29, 8001)
    want = []
    for i in np.nonzero(s[:-1] * s[1:] < 0)[0]:
        r = brentq(f, W[i], W[i + 1], xtol=1e-13)
        if abs(f(r)) < 1e-6:
            want.append(r)
    np.testing.assert_allclose(np.sort(got), np.sort(want), rtol=1e-9)


@pytest.mark.parametrize("m", [0, 1])
@pytest.mark.slow
def test_cylinder_relation_matches_solver_uniform_limit(m):
    """Analytic Edwin-Roberts roots == shooting-engine roots, width=1e5."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from eigensolver_tpu.physics.cylinder import CylinderPhysics
    from eigensolver_tpu.search import (
        SearchConfig, bisect, find_brackets, ladder_scan)

    case = cases.cylinder_density_coronal(width=1e5)
    rg = case.regime
    k = 1.5
    v_lo, v_hi = 2.05, 4.9   # fast-body window (vA_i0, vA_e), off band edges

    roots_an = scan_relation(
        lambda v: cylinder_relation(rg, v, k, m), v_lo, v_hi)

    ph = CylinderPhysics.from_case(case)
    disp = jax.jit(jax.vmap(ph.make_dispersion(m=m, dtype=jnp.float64)))
    om = jnp.asarray(np.linspace(v_lo, v_hi, 2001) * k)[None, :]
    ks = jnp.asarray([k])
    det, valid, _ = ladder_scan(disp, om, ks)
    br = find_brackets(om, ks, det, valid, max_per_row=16)
    pr = bisect(disp, br, n_iter=55)
    mask = np.asarray(pr.mask) & (np.asarray(pr.mismatch) < 0.5)
    roots_sh = np.sort(np.asarray(pr.omega)[mask]) / k

    assert len(roots_an) == len(roots_sh) > 0
    np.testing.assert_allclose(roots_sh, np.sort(roots_an), rtol=5e-4)


def test_analytic_curves_shape():
    rg = cases.slab_density_photospheric(width=1e5).regime
    curves = analytic_curves(rg, ks=[0.5, 1.5, 2.5], v_lo=0.95, v_hi=1.29,
                             geometry="slab", modes=(0, 1))
    assert set(curves) == {"sausage", "kink"}
    for br in curves.values():
        assert len(br.omegas) == len(br.ks)
        assert np.all(np.diff(br.ks) >= 0)
