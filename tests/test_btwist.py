"""Magnetic-twist (B_phi != 0) branch of the Hain-Lust coefficient chain,
validated against a sympy re-derivation of the reference's exact symbolic
definitions (`Cylinder/Rotational flow/Photospheric/Solvers/
Twisted_photospheric_flow_sausage.py:167-173` equilibrium with the kept
`B_twist*r` azimuthal-field branch, `:482-535` coefficient chain). The
reference lambdifies these sympy expressions per (omega, k); here they serve
only as the test oracle for the closed-form JAX chain in
`eigensolver_tpu.physics.cylinder.CylinderPhysics.coefficients` (including
the jax.grad-derived C3/g terms).
"""
import numpy as np
import jax.numpy as jnp
import pytest
import sympy as sym

from eigensolver_tpu import cases
from eigensolver_tpu.physics.cylinder import CylinderPhysics

B_TWIST = 0.1
V_TWIST = 0.15
POWER = 1.25


def _sympy_chain(rg, omega, k, m):
    """The reference's symbolic coefficient chain, verbatim algebra."""
    r = sym.symbols("r", positive=True)
    gamma = sym.Rational(5, 3)
    rho = sym.Float(rg.rho_i0)
    B_0 = rg.vA_i0 * sym.sqrt(rho)
    P_0 = rg.c_i0 ** 2 * rho / gamma

    B_iphi = B_TWIST * r
    B_i = B_0 * sym.sqrt(1 - 2 * B_iphi ** 2 / B_0 ** 2)
    v_iphi = V_TWIST * r ** POWER
    P_i = rho * V_TWIST ** 2 * r ** (2 * POWER) / (2 * POWER) + P_0
    c_i = sym.sqrt(P_i * gamma / rho)
    # reference vA_i sums the components (`:210-211`)
    vA_i = (B_i + B_iphi) / sym.sqrt(rho)

    shift = omega - m * v_iphi / r - k * 0
    # reference alfven_freq divides only the k*B_i term by sqrt(rho) (`:485-486`)
    alfven = m * B_iphi / r + k * B_i / sym.sqrt(rho)
    cusp = alfven * c_i / sym.sqrt(c_i ** 2 + vA_i ** 2)
    D = rho * (c_i ** 2 + vA_i ** 2) * (shift ** 2 - alfven ** 2) * (
        shift ** 2 - cusp ** 2)
    fb = m * B_iphi / r + k * B_i
    Q = (-(shift ** 2 - alfven ** 2) * rho * v_iphi ** 2 / r
         + 2 * shift ** 2 * B_iphi ** 2 / r
         + 2 * shift * B_iphi * v_iphi * fb / r)
    T = fb * B_iphi + rho * v_iphi * shift
    C1 = (Q * shift ** 2
          - 2 * m * (c_i ** 2 + vA_i ** 2) * (shift ** 2 - cusp ** 2) * T / r ** 2)
    C2 = (shift ** 4
          - (c_i ** 2 + vA_i ** 2) * (m ** 2 / r ** 2 + k ** 2) * (shift ** 2 - cusp ** 2))
    C3_diff = (B_iphi / r) ** 2 - rho * (v_iphi / r) ** 2
    C3 = (D * (rho * (shift ** 2 - alfven ** 2) + r * sym.diff(C3_diff, r))
          + (Q ** 2 - 4 * (c_i ** 2 + vA_i ** 2) * (shift ** 2 - cusp ** 2) * T ** 2 / r ** 2))
    F = r * D / C3
    # g = -d/dr(r C1/C3) - r (C2 - C1^2/C3)/D (`Density_cylinder.py:617-619`)
    g = -sym.diff(r * C1 / C3, r) - r * (C2 - C1 ** 2 / C3) / D
    mods = ["numpy"]
    return {name: sym.lambdify(r, expr, mods) for name, expr in
            [("D", D), ("C1", C1), ("C3", C3), ("F", F), ("g", g),
             ("invF", C3 / (r * D))]}


@pytest.mark.parametrize("m", [0, 1])
def test_btwist_coefficient_chain_matches_sympy(m):
    case = cases.cylinder_twisted_magnetic(
        B_twist=B_TWIST, v_twist=V_TWIST, power=POWER, mode=m)
    ph = CylinderPhysics.from_case(case)
    omega, k = 1.3, 0.9
    oracle = _sympy_chain(case.regime, omega, k, m)
    Dfun, C1fun, C3fun, Ffun, gfun, invFfun, invF_g = ph.coefficients(
        jnp.float64(omega), jnp.float64(k), m, twisted_c1=True)
    ours = {"D": Dfun, "C1": C1fun, "C3": C3fun, "F": Ffun, "g": gfun,
            "invF": invFfun}
    for rv in (0.3, 0.7, 0.95):
        for name in ours:
            want = float(oracle[name](rv))
            got = float(ours[name](jnp.float64(rv)))
            np.testing.assert_allclose(
                got, want, rtol=1e-9,
                err_msg=f"{name}(r={rv}) m={m} mismatch vs sympy oracle")
        # the fused hot-path evaluator (one shared chain + forward-mode
        # jvp for the d(r C1/C3)/dr term) must agree with the sympy oracle
        # too - it is what the interior RK4 actually integrates
        iF_f, g_f = invF_g(jnp.float64(rv))
        np.testing.assert_allclose(float(iF_f), float(oracle["invF"](rv)),
                                   rtol=1e-9)
        np.testing.assert_allclose(float(g_f), float(oracle["g"](rv)),
                                   rtol=1e-9)


def test_btwist_equilibrium_force_balance():
    """d/dr(P + (B_z^2+B_phi^2)/2) + B_phi^2/r - rho v_phi^2/r == 0 for the
    linear-B_phi equilibrium (the reference's PT_i check, `:196-198`)."""
    from eigensolver_tpu.equilibrium import make_equilibrium
    from eigensolver_tpu.profiles import elementwise_grad

    case = cases.cylinder_twisted_magnetic(
        B_twist=B_TWIST, v_twist=V_TWIST, power=POWER)
    eq = make_equilibrium(case)

    def total_p(r):
        return eq.P_i(r) + (eq.B_i(r) ** 2 + eq.B_phi(r) ** 2) / 2.0

    dtp = elementwise_grad(total_p)
    r = jnp.linspace(0.05, 1.0, 64)
    resid = (np.asarray(dtp(r)) + np.asarray(eq.B_phi(r)) ** 2 / np.asarray(r)
             - np.asarray(eq.rho_i(r)) * np.asarray(eq.v_phi(r)) ** 2 / np.asarray(r))
    np.testing.assert_allclose(resid, 0.0, atol=1e-12)


@pytest.mark.slow
def test_btwist_reduces_to_flow_twist_at_zero_field():
    """B_twist -> 0 must reproduce the pure rotational-flow determinant."""
    import jax

    base = cases.cylinder_twisted_photospheric(v_twist=0.1, power=1.0, mode=1)
    withb = cases.cylinder_twisted_magnetic(
        B_twist=0.0, v_twist=0.1, power=1.0, mode=1)
    from eigensolver_tpu.sweep import make_dispersion
    d0 = jax.jit(jax.vmap(make_dispersion(base, 1)))
    d1 = jax.jit(jax.vmap(make_dispersion(withb, 1)))
    om = jnp.linspace(1.05, 1.25, 32)
    kk = jnp.full((32,), 1.2)
    r0 = d0(om, kk)
    r1 = d1(om, kk)
    np.testing.assert_allclose(np.asarray(r1.det), np.asarray(r0.det),
                               rtol=1e-9)


@pytest.mark.slow
def test_btwist_dispersion_finds_roots():
    """The B_phi != 0 engine produces finite determinants with sign changes
    in the photospheric surface-mode window (smoke: the branch is live)."""
    import jax

    case = cases.cylinder_twisted_magnetic(B_twist=0.1, v_twist=0.1, mode=1)
    import dataclasses
    case = dataclasses.replace(
        case, grid=dataclasses.replace(case.grid, n_interior=512))
    from eigensolver_tpu.sweep import make_dispersion
    disp = jax.jit(jax.vmap(make_dispersion(case, 1)))
    k = 1.2
    om = jnp.linspace(0.9 * k, 1.4 * k, 256)
    res = disp(om, jnp.full((256,), k))
    det = np.asarray(res.det)
    assert np.isfinite(det).mean() > 0.9
    s = np.signbit(det)
    assert (s[:-1] != s[1:]).any(), "no sign change in the search window"


@pytest.mark.slow
def test_btwist_eigenvalues_vs_independent_scipy_shooting():
    """Eigenvalue-level validation of the magnetic-twist branch (VERDICT r02
    missing #6): kink eigenvalues of `cylinder_twisted_magnetic` are
    re-located by a fully independent pipeline - sympy-lambdified
    coefficients (the reference's verbatim symbolic chain, here with
    (omega, k) symbolic so the chain is built ONCE), scipy LSODA
    integration of the same flux-form interior ODE, and scipy `special.kv`
    for the exterior K_m - and must agree to <= 1e-4 relative at 3+ roots.
    Reference formulation: `Twisted_photospheric_flow_sausage.py:482-535,
    555-577` interior chain; kink jump objective
    `Twisted_photospheric_nonlinear_flow_kink_fast.py:561,697`."""
    import dataclasses
    from scipy.integrate import solve_ivp
    from scipy.optimize import brentq
    from scipy.special import kv

    from eigensolver_tpu.search import SearchConfig
    from eigensolver_tpu.sweep import run_case

    case = cases.cylinder_twisted_magnetic(
        B_twist=B_TWIST, v_twist=V_TWIST, power=POWER, mode=1)
    case = dataclasses.replace(case, k_values=(0.8, 1.4, 2.0),
                               speeds=(1.02, 1.2, 1.35))
    from eigensolver_tpu.equilibrium import genuine_continua_rowfn
    rs, _ = run_case(case, SearchConfig(
        n_omega=128, n_bisect=55,
        exclude_omega_rowfn=genuine_continua_rowfn(case)))
    br = rs["kink"]
    assert len(br) >= 3, "expected kink roots in the surface-mode window"

    rg = case.regime
    eps = case.grid.axis_epsilon
    rho_e = rg.rho_e
    cT_e2 = rg.c_e ** 2 * rg.vA_e ** 2 / (rg.c_e ** 2 + rg.vA_e ** 2)
    mval = 1

    # --- symbolic chain with (omega, k) free: built once, lambdified over
    # (r, omega, k); mirrors _sympy_chain verbatim ------------------------
    r, om_s, k_s = sym.symbols("r omega k", positive=True)
    gamma = sym.Rational(5, 3)
    rho = sym.Float(rg.rho_i0)
    B_0 = rg.vA_i0 * sym.sqrt(rho)
    P_0 = rg.c_i0 ** 2 * rho / gamma
    B_iphi = B_TWIST * r
    B_i = B_0 * sym.sqrt(1 - 2 * B_iphi ** 2 / B_0 ** 2)
    v_iphi = V_TWIST * r ** POWER
    P_i = rho * V_TWIST ** 2 * r ** (2 * POWER) / (2 * POWER) + P_0
    c_i = sym.sqrt(P_i * gamma / rho)
    vA_i = (B_i + B_iphi) / sym.sqrt(rho)
    shift = om_s - mval * v_iphi / r
    alfven = mval * B_iphi / r + k_s * B_i / sym.sqrt(rho)
    cusp = alfven * c_i / sym.sqrt(c_i ** 2 + vA_i ** 2)
    D = rho * (c_i ** 2 + vA_i ** 2) * (shift ** 2 - alfven ** 2) * (
        shift ** 2 - cusp ** 2)
    fb = mval * B_iphi / r + k_s * B_i
    Q = (-(shift ** 2 - alfven ** 2) * rho * v_iphi ** 2 / r
         + 2 * shift ** 2 * B_iphi ** 2 / r
         + 2 * shift * B_iphi * v_iphi * fb / r)
    T = fb * B_iphi + rho * v_iphi * shift
    C1 = (Q * shift ** 2
          - 2 * mval * (c_i ** 2 + vA_i ** 2) * (shift ** 2 - cusp ** 2)
          * T / r ** 2)
    C2 = (shift ** 4 - (c_i ** 2 + vA_i ** 2)
          * (mval ** 2 / r ** 2 + k_s ** 2) * (shift ** 2 - cusp ** 2))
    C3_diff = (B_iphi / r) ** 2 - rho * (v_iphi / r) ** 2
    C3 = (D * (rho * (shift ** 2 - alfven ** 2) + r * sym.diff(C3_diff, r))
          + (Q ** 2 - 4 * (c_i ** 2 + vA_i ** 2) * (shift ** 2 - cusp ** 2)
             * T ** 2 / r ** 2))
    F = r * D / C3
    g = -sym.diff(r * C1 / C3, r) - r * (C2 - C1 ** 2 / C3) / D
    lam = {n: sym.lambdify((r, om_s, k_s), e, "numpy") for n, e in
           [("C1", C1), ("C3", C3), ("F", F), ("g", g),
            ("invF", C3 / (r * D))]}

    def indep_det(omega, k):
        C1_1, C3_1, F1 = (lam["C1"](1.0, omega, k), lam["C3"](1.0, omega, k),
                          lam["F"](1.0, omega, k))

        nfev = [0]

        def rhs(rr, y):
            # nfev budget: LSODA's step collapses near twisted-continuum
            # resonances (cf. tools/ref_recheck._ivp); bail to NaN there
            nfev[0] += 1
            if nfev[0] > 100_000:
                raise RuntimeError("stiff")
            return [y[1] * lam["invF"](rr, omega, k),
                    lam["g"](rr, omega, k) * y[0]]

        def shoot(y0):
            try:
                s = solve_ivp(rhs, (1.0, eps), y0, method="LSODA",
                              rtol=1e-10, atol=1e-12)
            except RuntimeError:
                return np.nan
            return s.y[0, -1]

        P1_eps = shoot([1.0, 0.0])              # u1: P(1)=1, w(1)=0
        P2_eps = shoot([0.0, F1])               # u2: P(1)=0, w(1)=F(1)
        xi1 = C1_1 / C3_1
        xi2 = F1
        m_e = ((k ** 2 * rg.vA_e ** 2 - omega ** 2)
               * (k ** 2 * rg.c_e ** 2 - omega ** 2)
               / ((rg.vA_e ** 2 + rg.c_e ** 2)
                  * (k ** 2 * cT_e2 - omega ** 2)))
        sq = np.sqrt(m_e)
        dlog_K = sq * (-(kv(mval - 1, sq) + kv(mval + 1, sq)) / 2.0) / kv(mval, sq)
        xi_e = dlog_K / (rho_e * (omega ** 2 - k ** 2 * rg.vA_e ** 2))
        J = (B_TWIST * 1.0) ** 2 - rg.rho_i0 * (V_TWIST * 1.0 ** POWER) ** 2
        m1 = xi1 * 1.0 - xi_e * 1.0
        m2 = xi2 * 1.0 - xi_e * 0.0
        return P1_eps * m2 - P2_eps * m1 + J * xi_e * xi2

    checked = 0
    for omega, k in zip(np.asarray(br.omegas), np.asarray(br.ks)):
        if checked >= 4:
            break
        lo, hi = omega * (1 - 5e-4), omega * (1 + 5e-4)
        f_lo, f_hi = indep_det(lo, k), indep_det(hi, k)
        if not (np.isfinite(f_lo) and np.isfinite(f_hi)):
            continue
        if np.sign(f_lo) == np.sign(f_hi):
            continue
        om_indep = brentq(lambda w: indep_det(w, k), lo, hi, xtol=1e-12)
        np.testing.assert_allclose(om_indep, omega, rtol=1e-4)
        checked += 1
    assert checked >= 3, f"only {checked} roots bracketed by the scipy shoot"
